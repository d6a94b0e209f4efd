"""1-D DWT/IDWT (reference `dwt/transform1d.py:7-115` + AFB1D/SFB1D
`dwt/lowlevel.py:368-424,697-743`).

Operates on (N, C, L) arrays; internally reuses the 2-D filter banks on
a singleton height axis, exactly like the reference wraps its 4-D
engine.  Analytic-adjoint custom VJPs mirror AFB1D/SFB1D.backward.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets.coeffs import get_wavelet
from ficsr_tpu.wavelets.lowlevel import _analysis_filters, _synthesis_filters, afb1d, sfb1d

__all__ = ["dwt1", "idwt1", "wavedec1", "waverec1", "DWT1DForward", "DWT1DInverse"]


def _to4(x):
    return x[:, :, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dwt1(x: jnp.ndarray, wave: str = "haar", mode: str = "reflect"):
    """Single-level 1-D DWT. x: (N,C,L) -> (lo, hi) each (N,C,L')."""
    h0, h1 = _analysis_filters(wave)
    lo, hi = afb1d(_to4(x), h0, h1, mode=mode, axis=3)
    return lo[:, :, 0], hi[:, :, 0]


def _dwt1_fwd(x, wave, mode):
    return dwt1(x, wave, mode), x.shape[-1]


def _dwt1_bwd(wave, mode, in_len, ct):
    d_lo, d_hi = ct
    h0, h1 = _analysis_filters(wave)
    dx = sfb1d(_to4(d_lo), _to4(d_hi), h0, h1, mode=mode, axis=3)[:, :, 0]
    return (dx[:, :, :in_len],)


dwt1.defvjp(_dwt1_fwd, _dwt1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def idwt1(lo: jnp.ndarray, hi: jnp.ndarray, wave: str = "haar",
          mode: str = "reflect") -> jnp.ndarray:
    g0, g1 = _synthesis_filters(wave)
    return sfb1d(_to4(lo), _to4(hi), g0, g1, mode=mode, axis=3)[:, :, 0]


def _idwt1_fwd(lo, hi, wave, mode):
    return idwt1(lo, hi, wave, mode), lo.shape[-1]


def _idwt1_bwd(wave, mode, lo_len, ct):
    g0, g1 = _synthesis_filters(wave)
    d_lo, d_hi = afb1d(_to4(ct), g0, g1, mode=mode, axis=3)
    return d_lo[:, :, 0, :lo_len], d_hi[:, :, 0, :lo_len]


idwt1.defvjp(_idwt1_fwd, _idwt1_bwd)


def wavedec1(x, wave="haar", mode="reflect", level=1):
    """(N,C,L) -> (lo, [hi_1..hi_J]), finest first."""
    yh = []
    lo = x
    for _ in range(level):
        lo, hi = dwt1(lo, wave, mode)
        yh.append(hi)
    return lo, yh


def waverec1(coeffs, wave="haar", mode="reflect"):
    lo, yh = coeffs
    for hi in yh[::-1]:
        if hi is None:
            hi = jnp.zeros_like(lo)
        if lo.shape[-1] > hi.shape[-1]:
            lo = lo[..., :-1]
        lo = idwt1(lo, hi, wave, mode)
    return lo


class DWT1DForward:
    def __init__(self, J: int = 1, wave: str = "db1", mode: str = "zero"):
        self.J, self.wave, self.mode = J, get_wavelet(wave).name, mode

    def __call__(self, x):
        return wavedec1(x, self.wave, self.mode, level=self.J)


class DWT1DInverse:
    def __init__(self, wave: str = "db1", mode: str = "zero"):
        self.wave, self.mode = get_wavelet(wave).name, mode

    def __call__(self, coeffs):
        return waverec1(coeffs, self.wave, self.mode)
