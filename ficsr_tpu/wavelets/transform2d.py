"""2-D DWT/IDWT with analytic-adjoint custom VJP.

Rebuilds the reference `DWTForward`/`DWTInverse`
(`/root/reference/pytorch_wavelets/pytorch_wavelets/dwt/transform2d.py:20-148`)
and the autograd Functions AFB2D/SFB2D (`dwt/lowlevel.py:312-365,647-694`)
as JAX functions:

  * ``dwt2`` / ``idwt2``       — single level
  * ``wavedec2`` / ``waverec2``— multi level (J loop)
  * ``DWTForward`` / ``DWTInverse`` — callable wrappers with the same
    constructor signature as pytorch_wavelets for drop-in familiarity.

Subband order matches the reference exactly: ``highs[:, :, 0] = LH``
(low row-pass, high column-pass), ``1 = HL``, ``2 = HH``
(`dwt/lowlevel.py:341-347`).

Gradients: `jax.custom_vjp` implements the reference's analytic adjoint
— the backward of analysis is one level of synthesis *with the analysis
filters* (`dwt/lowlevel.py:349-365`) — so no activations are saved and
converted-model training dynamics match the reference bit-for-bit
(including its approximate boundary adjoint for non-zero pad modes).

A Haar fast path lowers the J=1 even-size transform (the exact op the
frequency discriminators run every step, `model.py:140,190`) to pure
reshape arithmetic on the VPU — no convolution at all; see also the
fused Pallas kernel in `pallas_haar.py`.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets.coeffs import get_wavelet
from ficsr_tpu.wavelets.lowlevel import (
    _analysis_filters,
    _synthesis_filters,
    afb1d,
    sfb1d,
)

__all__ = [
    "dwt2",
    "idwt2",
    "wavedec2",
    "waverec2",
    "DWTForward",
    "DWTInverse",
]


_INV_SQRT2_SQ = 0.5  # (1/sqrt(2))^2 — exact in float


def _haar_even_afb2d(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Haar J=1 on even H,W: zero padding needed (p=0) for every mode,
    so the filter bank collapses to 2x2 block arithmetic."""
    n, c, h, w = x.shape
    v = x.reshape(n, c, h // 2, 2, w // 2, 2)
    a = v[:, :, :, 0, :, 0]
    b = v[:, :, :, 0, :, 1]
    cc = v[:, :, :, 1, :, 0]
    d = v[:, :, :, 1, :, 1]
    half = jnp.asarray(_INV_SQRT2_SQ, x.dtype)
    ll = (a + b + cc + d) * half
    lh = (a + b - cc - d) * half   # low row-pass, high col-pass
    hl = (a - b + cc - d) * half
    hh = (a - b - cc + d) * half
    return ll, jnp.stack([lh, hl, hh], axis=2)


def _haar_even_sfb2d(ll: jnp.ndarray, highs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `_haar_even_afb2d` (also its exact adjoint)."""
    lh, hl, hh = highs[:, :, 0], highs[:, :, 1], highs[:, :, 2]
    half = jnp.asarray(_INV_SQRT2_SQ, ll.dtype)
    a = (ll + lh + hl + hh) * half
    b = (ll + lh - hl - hh) * half
    cc = (ll - lh + hl - hh) * half
    d = (ll - lh - hl + hh) * half
    n, c, h2, w2 = ll.shape
    v = jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([cc, d], axis=-1)], axis=-3
    )  # (n, c, h2, 2, w2, 2)
    return v.reshape(n, c, h2 * 2, w2 * 2)


def _is_haar_even(wave: str, mode: str, h: int, w: int) -> bool:
    return (
        wave in ("haar", "db1")
        and h % 2 == 0
        and w % 2 == 0
        and mode not in ("per", "periodization")
    )


def _use_pallas_haar() -> bool:
    import jax as _jax

    return _jax.default_backend() == "tpu"


def _afb2d_impl(x: jnp.ndarray, wave: str, mode: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if _is_haar_even(wave, mode, x.shape[2], x.shape[3]):
        if _use_pallas_haar():
            # fused single-pass kernel: measured 0.313 ms vs 0.358 ms
            # for the XLA fusion at 32x1x256x256 (honest host-sync
            # timing; see benchmarks/README.md)
            from ficsr_tpu.wavelets.pallas_haar import _fwd_call

            return _fwd_call(x, False, False)
        return _haar_even_afb2d(x)
    h0, h1 = _analysis_filters(wave)
    lo_r, hi_r = afb1d(x, h0, h1, mode=mode, axis=3)
    ll, lh = afb1d(lo_r, h0, h1, mode=mode, axis=2)
    hl, hh = afb1d(hi_r, h0, h1, mode=mode, axis=2)
    return ll, jnp.stack([lh, hl, hh], axis=2)


def _sfb2d_impl(ll: jnp.ndarray, highs: jnp.ndarray, wave: str, mode: str) -> jnp.ndarray:
    if _is_haar_even(wave, mode, ll.shape[2] * 2, ll.shape[3] * 2):
        if _use_pallas_haar():
            from ficsr_tpu.wavelets.pallas_haar import _inv_call

            return _inv_call(ll, highs, False, False)
        return _haar_even_sfb2d(ll, highs)
    g0, g1 = _synthesis_filters(wave)
    lh, hl, hh = highs[:, :, 0], highs[:, :, 1], highs[:, :, 2]
    lo = sfb1d(ll, lh, g0, g1, mode=mode, axis=2)
    hi = sfb1d(hl, hh, g0, g1, mode=mode, axis=2)
    return sfb1d(lo, hi, g0, g1, mode=mode, axis=3)


# --- single level with analytic adjoint ------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dwt2(x: jnp.ndarray, wave: str = "haar", mode: str = "reflect"):
    """Single-level 2-D DWT. x: (N,C,H,W) -> (ll, highs (N,C,3,H',W'))."""
    return _afb2d_impl(x, wave, mode)


def _dwt2_fwd(x, wave, mode):
    return _afb2d_impl(x, wave, mode), (x.shape[2], x.shape[3])


def _dwt2_bwd(wave, mode, res, ct):
    in_h, in_w = res
    d_ll, d_highs = ct
    # One level of synthesis with the ANALYSIS filters — the reference's
    # AFB2D.backward (`dwt/lowlevel.py:349-365`).  For Haar on even
    # sizes the transform is orthogonal with no padding, so the adjoint
    # IS the fast inverse.
    if _is_haar_even(wave, mode, in_h, in_w):
        return (_sfb2d_impl(d_ll, d_highs, wave, mode),)
    h0, h1 = _analysis_filters(wave)
    lo = sfb1d(d_ll, d_highs[:, :, 0], h0, h1, mode=mode, axis=2)
    hi = sfb1d(d_highs[:, :, 1], d_highs[:, :, 2], h0, h1, mode=mode, axis=2)
    dx = sfb1d(lo, hi, h0, h1, mode=mode, axis=3)
    dx = dx[:, :, :in_h, :in_w]
    return (dx,)


dwt2.defvjp(_dwt2_fwd, _dwt2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def idwt2(ll: jnp.ndarray, highs: jnp.ndarray, wave: str = "haar",
          mode: str = "reflect") -> jnp.ndarray:
    """Single-level 2-D inverse DWT."""
    return _sfb2d_impl(ll, highs, wave, mode)


def _idwt2_fwd(ll, highs, wave, mode):
    return _sfb2d_impl(ll, highs, wave, mode), (ll.shape, highs.shape)


def _idwt2_bwd(wave, mode, res, ct):
    ll_shape, highs_shape = res
    # One level of analysis with the SYNTHESIS filters — the reference's
    # SFB2D.backward (`dwt/lowlevel.py:682-694`).
    if _is_haar_even(wave, mode, ct.shape[2], ct.shape[3]):
        d_ll, d_highs = _afb2d_impl(ct, wave, mode)
        return d_ll, d_highs
    g0, g1 = _synthesis_filters(wave)
    lo_r, hi_r = afb1d(ct, g0, g1, mode=mode, axis=3)
    d_ll, d_lh = afb1d(lo_r, g0, g1, mode=mode, axis=2)
    d_hl, d_hh = afb1d(hi_r, g0, g1, mode=mode, axis=2)
    d_ll = d_ll[:, :, :ll_shape[2], :ll_shape[3]]
    d_highs = jnp.stack([d_lh, d_hl, d_hh], axis=2)
    d_highs = d_highs[:, :, :, :highs_shape[3], :highs_shape[4]]
    return d_ll, d_highs


idwt2.defvjp(_idwt2_fwd, _idwt2_bwd)


# --- multi level ------------------------------------------------------------


def wavedec2(x: jnp.ndarray, wave: str = "haar", mode: str = "reflect",
             level: int = 1) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """J-level 2-D DWT: returns (yl, [yh_1 .. yh_J]) with yh_j of shape
    (N, C, 3, H_j, W_j) — finest scale first (reference
    `transform2d.py:44-74`)."""
    yh = []
    ll = x
    for _ in range(level):
        ll, high = dwt2(ll, wave, mode)
        yh.append(high)
    return ll, yh


def waverec2(coeffs, wave: str = "haar", mode: str = "reflect") -> jnp.ndarray:
    """Inverse of `wavedec2` (reference `transform2d.py:111-148`): unused
    (None) subbands become zeros; odd-size lowpasses are cropped by one
    row/column before each synthesis level."""
    ll, yh = coeffs
    for high in yh[::-1]:
        if high is None:
            high = jnp.zeros(
                (ll.shape[0], ll.shape[1], 3, ll.shape[2], ll.shape[3]), ll.dtype
            )
        if ll.shape[-2] > high.shape[-2]:
            ll = ll[..., :-1, :]
        if ll.shape[-1] > high.shape[-1]:
            ll = ll[..., :-1]
        ll = idwt2(ll, high, wave, mode)
    return ll


# --- class wrappers (pytorch_wavelets-shaped API) ---------------------------


class DWTForward:
    """Callable matching pytorch_wavelets `DWTForward(J, wave, mode)`."""

    def __init__(self, J: int = 1, wave: str = "db1", mode: str = "zero"):
        self.J = J
        self.wave = get_wavelet(wave).name
        self.mode = mode

    def __call__(self, x: jnp.ndarray):
        return wavedec2(x, self.wave, self.mode, level=self.J)


class DWTInverse:
    """Callable matching pytorch_wavelets `DWTInverse(wave, mode)`."""

    def __init__(self, wave: str = "db1", mode: str = "zero"):
        self.wave = get_wavelet(wave).name
        self.mode = mode

    def __call__(self, coeffs) -> jnp.ndarray:
        return waverec2(coeffs, self.wave, self.mode)
