"""DTCWT ScatterNet layers (reference `scatternet/layers.py:11-172`,
`scatternet/lowlevel.py:49-599`).

`ScatLayer` — one order of scattering at one scale: level-1 DTCWT,
smooth complex magnitude sqrt(re^2 + im^2 + b^2) - b on the six
orientations, average-pooled lowpass; output (N, 7C, H/2, W/2).

`ScatLayerj2` — two orders / two scales with proper qshift second-level
filters; output (N, 49C, H/4, W/4) = [s0 | s1_j1(6) | s1_j2(6) |
s2_j1(36)] per input channel.

The reference hand-writes autograd Functions to save the magnitude
phases; in JAX the plain composition is used — the smooth magnitude is
differentiable everywhere (b > 0) and the DTCWT levels already carry
analytic-adjoint VJPs, so XLA derives the same backward.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ficsr_tpu.wavelets.dtcwt import coeffs as _coeffs
from ficsr_tpu.wavelets.dtcwt.transform_funcs import (
    fwd_j1,
    fwd_j1_rot,
    fwd_j2plus,
    fwd_j2plus_rot,
)

__all__ = ["ScatLayer", "ScatLayerj2", "smooth_mag"]


def _t(a) -> Tuple[float, ...]:
    return tuple(float(x) for x in np.asarray(a).ravel())


def smooth_mag(reals: jnp.ndarray, imags: jnp.ndarray,
               bias: float) -> jnp.ndarray:
    """sqrt(re^2 + im^2 + b^2) - b (reference SmoothMagFn,
    scatternet/lowlevel.py:49-68)."""
    return jnp.sqrt(reals ** 2 + imags ** 2 + bias ** 2) - bias


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pool on the trailing two axes."""
    shape = x.shape
    v = x.reshape(shape[:-2] + (shape[-2] // 2, 2, shape[-1] // 2, 2))
    return v.mean(axis=(-3, -1))


def _pad_even(x: jnp.ndarray) -> jnp.ndarray:
    r, c = x.shape[2], x.shape[3]
    if r % 2 != 0:
        x = jnp.concatenate([x, x[:, :, -1:]], axis=2)
    if c % 2 != 0:
        x = jnp.concatenate([x, x[:, :, :, -1:]], axis=3)
    return x


class ScatLayer:
    """First-order scattering (reference ScatLayer, layers.py:11-81)."""

    def __init__(self, biort: str = "near_sym_a", mode: str = "symmetric",
                 magbias: float = 1e-2, combine_colour: bool = False):
        self.biort = biort
        self.mode = mode
        self.magbias = magbias
        self.combine_colour = combine_colour
        self.bandpass_diag = biort == "near_sym_b_bp"
        if self.bandpass_diag:
            h0o, _, h1o, _, h2o, _ = _coeffs.biort(biort)
            self.h2o = _t(h2o)
        else:
            h0o, _, h1o, _ = _coeffs.biort(biort)
            self.h2o = None
        self.h0o, self.h1o = _t(h0o), _t(h1o)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[1]
        x = _pad_even(x)
        if self.combine_colour:
            assert ch == 3

        if self.bandpass_diag:
            ll, reals, imags = fwd_j1_rot(
                x, self.h0o, self.h1o, self.h2o, False, 1, self.mode)
        else:
            ll, reals, imags = fwd_j1(x, self.h0o, self.h1o, False, 1,
                                      self.mode)
        ll = _avg_pool2(ll)
        if self.combine_colour:
            r = jnp.sqrt(
                reals[:, :, 0] ** 2 + imags[:, :, 0] ** 2 +
                reals[:, :, 1] ** 2 + imags[:, :, 1] ** 2 +
                reals[:, :, 2] ** 2 + imags[:, :, 2] ** 2 +
                self.magbias ** 2) - self.magbias
            return jnp.concatenate([ll, r], axis=1)
        r = smooth_mag(reals, imags, self.magbias)  # (N, 6, C, H2, W2)
        z = jnp.concatenate([ll[:, None], r], axis=1)  # (N, 7, C, H2, W2)
        b, o, c, h, w = z.shape
        return z.reshape(b, o * c, h, w)


class ScatLayerj2:
    """Second-order scattering (reference ScatLayerj2, layers.py:84-172,
    forward math in ScatLayerj2_f, scatternet/lowlevel.py:~200-310)."""

    def __init__(self, biort: str = "near_sym_a", qshift: str = "qshift_a",
                 mode: str = "symmetric", magbias: float = 1e-2,
                 combine_colour: bool = False):
        self.mode = mode
        self.magbias = magbias
        self.combine_colour = combine_colour
        self.bandpass_diag = biort == "near_sym_b_bp"
        if self.bandpass_diag:
            assert qshift == "qshift_b_bp"
            h0o, _, h1o, _, h2o, _ = _coeffs.biort(biort)
            (h0a, h0b, _, _, h1a, h1b, _, _,
             h2a, h2b, _, _) = _coeffs.qshift(qshift)
            self.h2o, self.h2a, self.h2b = _t(h2o), _t(h2a), _t(h2b)
        else:
            h0o, _, h1o, _ = _coeffs.biort(biort)
            h0a, h0b, _, _, h1a, h1b, _, _ = _coeffs.qshift(qshift)
            self.h2o = self.h2a = self.h2b = None
        self.h0o, self.h1o = _t(h0o), _t(h1o)
        self.h0a, self.h0b = _t(h0a), _t(h0b)
        self.h1a, self.h1b = _t(h1a), _t(h1b)

    def _j1(self, x):
        if self.bandpass_diag:
            return fwd_j1_rot(x, self.h0o, self.h1o, self.h2o, False, 1,
                              self.mode)
        return fwd_j1(x, self.h0o, self.h1o, False, 1, self.mode)

    def _j2(self, x):
        if self.bandpass_diag:
            return fwd_j2plus_rot(x, self.h0a, self.h1a, self.h0b, self.h1b,
                                  self.h2a, self.h2b, False, 1, "symmetric")
        return fwd_j2plus(x, self.h0a, self.h1a, self.h0b, self.h1b,
                          False, 1, "symmetric")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[1]
        if self.combine_colour:
            assert ch == 3
        # extend to a multiple of 8 (reference layers.py:136-149)
        rem = x.shape[2] % 8
        if rem != 0:
            before, after = (8 - rem) // 2, (9 - rem) // 2
            x = jnp.concatenate(
                [x[:, :, :before], x, x[:, :, -after:]], axis=2)
        rem = x.shape[3] % 8
        if rem != 0:
            before, after = (8 - rem) // 2, (9 - rem) // 2
            x = jnp.concatenate(
                [x[:, :, :, :before], x, x[:, :, :, -after:]], axis=3)
        bias = self.magbias

        s0, reals, imags = self._j1(x)
        if self.combine_colour:
            s1_j1 = jnp.sqrt(
                reals[:, :, 0] ** 2 + imags[:, :, 0] ** 2 +
                reals[:, :, 1] ** 2 + imags[:, :, 1] ** 2 +
                reals[:, :, 2] ** 2 + imags[:, :, 2] ** 2 + bias ** 2)
            s1_j1 = (s1_j1 - bias)[:, :, None]
        else:
            s1_j1 = smooth_mag(reals, imags, bias)

        s0, reals, imags = self._j2(s0)
        if self.combine_colour:
            s1_j2 = jnp.sqrt(
                reals[:, :, 0] ** 2 + imags[:, :, 0] ** 2 +
                reals[:, :, 1] ** 2 + imags[:, :, 1] ** 2 +
                reals[:, :, 2] ** 2 + imags[:, :, 2] ** 2 + bias ** 2)
            s1_j2 = (s1_j2 - bias)[:, :, None]
        else:
            s1_j2 = smooth_mag(reals, imags, bias)
        s0 = _avg_pool2(s0)

        if self.combine_colour:
            s1_j1 = s1_j1[:, :, 0]
            s1_j1b, reals, imags = self._j1(s1_j1)
            s2_j1 = smooth_mag(reals, imags, bias)  # (N,6,6,H4,W4)
            q = s2_j1.shape
            s2_j1 = s2_j1.reshape(q[0], 36, q[3], q[4])
            s1_j1b = _avg_pool2(s1_j1b)
            return jnp.concatenate(
                [s0, s1_j1b, s1_j2[:, :, 0], s2_j1], axis=1)

        p = s1_j1.shape  # (N, 6, C, H2, W2)
        s1_flat = s1_j1.reshape(p[0], 6 * p[2], p[3], p[4])
        s1_low, reals, imags = self._j1(s1_flat)
        s2_j1 = smooth_mag(reals, imags, bias)  # (N, 6, 6C, H4, W4)
        q = s2_j1.shape
        s2_j1 = s2_j1.reshape(q[0], 36, q[2] // 6, q[3], q[4])
        s1_low = _avg_pool2(s1_low)
        s1_low = s1_low.reshape(p[0], 6, p[2], p[3] // 2, p[4] // 2)

        z = jnp.concatenate([s0[:, None], s1_low, s1_j2, s2_j1], axis=1)
        b, o, c, h, w = z.shape
        return z.reshape(b, o * c, h, w)
