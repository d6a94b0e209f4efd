"""DTCWT forward/inverse modules (reference `dtcwt/transform2d.py:20-254`).

API mirrors pytorch_wavelets: `DTCWTForward(biort, qshift, J, skip_hps,
include_scale, o_dim, ri_dim, mode)` returning (yl, yh) with yh[j] of
shape (N, C, 6, H_j, W_j, 2) under the default dims; skipped scales are
None (the reference uses empty 0-d tensors).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import jax.numpy as jnp
from jax import lax

from ficsr_tpu.wavelets.dtcwt import coeffs as _coeffs
from ficsr_tpu.wavelets.dtcwt.transform_funcs import (
    fwd_j1_vjp,
    fwd_j2plus_vjp,
    get_dimensions5,
    get_dimensions6,
    inv_j1_vjp,
    inv_j2plus_vjp,
)

__all__ = ["DTCWTForward", "DTCWTInverse"]


def _t(a) -> Tuple[float, ...]:
    import numpy as np

    return tuple(float(x) for x in np.asarray(a).ravel())


def _listify(v, J):
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v] * J


class DTCWTForward:
    def __init__(self, biort: Union[str, tuple] = "near_sym_a",
                 qshift: Union[str, tuple] = "qshift_a", J: int = 3,
                 skip_hps=False, include_scale=False,
                 o_dim: int = 2, ri_dim: int = -1, mode: str = "symmetric"):
        if o_dim % 6 == ri_dim % 6:
            raise ValueError("Orientations and real/imaginary parts must be "
                             "in different dimensions.")
        if isinstance(biort, str):
            h0o, _, h1o, _ = _coeffs.biort(biort)[:4]
        else:
            h0o, h1o = biort[0], biort[1]
        if isinstance(qshift, str):
            h0a, h0b, _, _, h1a, h1b, _, _ = _coeffs.qshift(qshift)[:8]
        else:
            h0a, h0b, h1a, h1b = qshift[:4]
        self.h0o, self.h1o = _t(h0o), _t(h1o)
        self.h0a, self.h0b = _t(h0a), _t(h0b)
        self.h1a, self.h1b = _t(h1a), _t(h1b)
        self.J = J
        self.o_dim, self.ri_dim, self.mode = o_dim, ri_dim, mode
        self.skip_hps = _listify(skip_hps, J)
        self.include_scale = _listify(include_scale, J)
        self._dims = get_dimensions5(o_dim, ri_dim)

    def _stack_ri(self, hr, hi):
        if hr is None:
            return None
        return jnp.stack([hr, hi], axis=self._dims[1])

    def __call__(self, x: jnp.ndarray):
        if self.J == 0:
            return x, None
        scales: List = [None] * self.J
        highs: List = [None] * self.J

        r, c = x.shape[2:]
        if r % 2 != 0:
            x = jnp.concatenate([x, x[:, :, -1:]], axis=2)
        if c % 2 != 0:
            x = jnp.concatenate([x, x[:, :, :, -1:]], axis=3)

        low, hr, hi = fwd_j1_vjp(
            x, self.h0o, self.h1o, bool(self.skip_hps[0]), self._dims,
            self.mode)
        highs[0] = self._stack_ri(hr, hi)
        if self.include_scale[0]:
            scales[0] = low

        for j in range(1, self.J):
            r, c = low.shape[2:]
            if r % 4 != 0:
                low = jnp.concatenate(
                    [low[:, :, 0:1], low, low[:, :, -1:]], axis=2)
            if c % 4 != 0:
                low = jnp.concatenate(
                    [low[:, :, :, 0:1], low, low[:, :, :, -1:]], axis=3)
            low, hr, hi = fwd_j2plus_vjp(
                low, self.h0a, self.h1a, self.h0b, self.h1b,
                bool(self.skip_hps[j]), self._dims, "symmetric")
            highs[j] = self._stack_ri(hr, hi)
            if self.include_scale[j]:
                scales[j] = low

        if True in self.include_scale:
            return scales, highs
        return low, highs


class DTCWTInverse:
    def __init__(self, biort: Union[str, tuple] = "near_sym_a",
                 qshift: Union[str, tuple] = "qshift_a",
                 o_dim: int = 2, ri_dim: int = -1, mode: str = "symmetric"):
        if isinstance(biort, str):
            _, g0o, _, g1o = _coeffs.biort(biort)[:4]
        else:
            g0o, g1o = biort[0], biort[1]
        if isinstance(qshift, str):
            _, _, g0a, g0b, _, _, g1a, g1b = _coeffs.qshift(qshift)[:8]
        else:
            g0a, g0b, g1a, g1b = qshift[:4]
        self.g0o, self.g1o = _t(g0o), _t(g1o)
        self.g0a, self.g0b = _t(g0a), _t(g0b)
        self.g1a, self.g1b = _t(g1a), _t(g1b)
        self.o_dim, self.ri_dim, self.mode = o_dim, ri_dim, mode
        self._dims5 = get_dimensions5(o_dim, ri_dim)
        self._dims6 = get_dimensions6(o_dim, ri_dim)

    def _unstack_ri(self, s):
        if s is None:
            return None
        ri = self.ri_dim % 6
        hr = lax.index_in_dim(s, 0, ri, keepdims=False)
        hi = lax.index_in_dim(s, 1, ri, keepdims=False)
        return hr, hi

    def _crop_to(self, low, s):
        _, _, h_dim, w_dim = self._dims6
        r, c = low.shape[2:]
        r1, c1 = s.shape[h_dim], s.shape[w_dim]
        if r != r1 * 2:
            low = low[:, :, 1:-1]
        if c != c1 * 2:
            low = low[:, :, :, 1:-1]
        return low

    def __call__(self, coeffs):
        low, highs = coeffs
        J = len(highs)
        for j, s in zip(range(J - 1, 0, -1), highs[1:][::-1]):
            if s is not None:
                assert s.shape[self.o_dim] == 6, \
                    "Inverse transform must have input with 6 orientations"
                assert s.ndim == 6, "Bandpass inputs must have 6 dimensions"
                assert s.shape[self.ri_dim % 6] == 2, \
                    "Inputs must be complex with real and imaginary parts " \
                    "in the ri dimension"
                low = self._crop_to(low, s)
            low = inv_j2plus_vjp(
                low, self._unstack_ri(s), self.g0a, self.g1a, self.g0b,
                self.g1b, self._dims5, "symmetric")
        if highs and highs[0] is not None:
            low = self._crop_to(low, highs[0])
        low = inv_j1_vjp(
            low, self._unstack_ri(highs[0] if highs else None),
            self.g0o, self.g1o, self._dims5, self.mode)
        return low
