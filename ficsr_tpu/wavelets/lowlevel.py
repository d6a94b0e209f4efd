"""Separable wavelet filter banks as XLA convolutions.

TPU-native rebuild of the reference DWT numerical core
(`/root/reference/pytorch_wavelets/pytorch_wavelets/dwt/lowlevel.py`):

  * ``wpad``       — replaces the reference's numpy-index `mypad`
                     (`dwt/lowlevel.py:28-88`): one `jnp.pad` call covers
                     zero/reflect/replicate/symmetric/periodic.
  * ``afb1d``      — 1-D analysis filter bank (`dwt/lowlevel.py:91-172`):
                     stride-2 correlation with the flipped filters, pad
                     amount from the pywt `dwt_coeff_len` formula.
  * ``sfb1d``      — 1-D synthesis bank (`dwt/lowlevel.py:226-271`):
                     expressed as an input-dilated (`lhs_dilation=2`)
                     convolution instead of conv_transpose — same math,
                     friendlier to XLA fusion.
  * ``afb2d/sfb2d``— separable 2-D single-level transforms with an
                     analytic-adjoint `jax.custom_vjp` mirroring the
                     reference autograd Functions AFB2D/SFB2D
                     (`dwt/lowlevel.py:312-365,647-694`): the backward of
                     analysis is synthesis *with the same (analysis)
                     filters*, so gradients bit-match the reference and
                     no activations are saved.

Channel handling: instead of grouped convolutions (the reference uses
``groups=C``), channels are folded into the batch dimension — a free
reshape — so XLA sees one dense small conv, which maps better onto the
TPU convolution engine.

All arrays are NCHW at the API boundary for drop-in parity with
pytorch_wavelets; internally XLA picks its own layouts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ficsr_tpu.wavelets.coeffs import dwt_coeff_len, get_wavelet

__all__ = [
    "wpad",
    "afb1d",
    "afb1d_multi",
    "sfb1d",
    "afb2d_nonsep",
    "sfb2d_nonsep",
    "prep_filt_afb2d",
    "prep_filt_sfb2d",
    "prep_filt_afb2d_nonsep",
    "prep_filt_sfb2d_nonsep",
    "MODES",
]

MODES = ("zero", "symmetric", "reflect", "periodization", "periodic", "replicate")

_PAD_MODE = {
    "zero": "constant",
    "constant": "constant",
    "reflect": "reflect",
    "replicate": "edge",
    "symmetric": "symmetric",
    "periodic": "wrap",
}


def wpad(x: jnp.ndarray, pad: Tuple[int, int], mode: str, axis: int) -> jnp.ndarray:
    """Pad `x` along one axis. `pad` = (before, after)."""
    if pad == (0, 0):
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = pad
    return jnp.pad(x, cfg, mode=_PAD_MODE[mode])


# ---------------------------------------------------------------------------
# Filter preparation
# ---------------------------------------------------------------------------


def _as_f32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float64).ravel().astype(np.float32)


@functools.lru_cache(maxsize=None)
def _analysis_filters(wave_name: str) -> Tuple[np.ndarray, np.ndarray]:
    """(h0, h1) flipped for correlation, float32 (reference prep_filt_afb1d)."""
    w = get_wavelet(wave_name)
    return _as_f32(w.dec_lo[::-1]), _as_f32(w.dec_hi[::-1])


@functools.lru_cache(maxsize=None)
def _synthesis_filters(wave_name: str) -> Tuple[np.ndarray, np.ndarray]:
    """(g0, g1) un-flipped, float32 (reference prep_filt_sfb1d)."""
    w = get_wavelet(wave_name)
    return _as_f32(w.rec_lo), _as_f32(w.rec_hi)


def prep_filt_afb2d(wave) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(h0_col, h1_col, h0_row, h1_row) as 1-D float32 arrays (pre-flipped)."""
    w = get_wavelet(wave if isinstance(wave, str) else wave.name)
    h0, h1 = _analysis_filters(w.name)
    return h0, h1, h0, h1


def prep_filt_sfb2d(wave) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    w = get_wavelet(wave if isinstance(wave, str) else wave.name)
    g0, g1 = _synthesis_filters(w.name)
    return g0, g1, g0, g1


def _fold_channels(x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    n, c = x.shape[0], x.shape[1]
    return x.reshape(n * c, 1, x.shape[2], x.shape[3]), n, c


# ---------------------------------------------------------------------------
# 1-D analysis / synthesis banks (applied along one spatial axis of NCHW)
# ---------------------------------------------------------------------------


def _conv_1d_along(x4: jnp.ndarray, w2: jnp.ndarray, axis: int,
                   stride: int, lhs_dilation: int = 1,
                   padding=((0, 0),)) -> jnp.ndarray:
    """Correlate the (B,1,H,W) tensor with a (K,L) filter stack along axis."""
    K, L = w2.shape[0], w2.shape[-1]
    if axis == 2:
        kernel = w2.reshape(K, 1, L, 1)
        strides = (stride, 1)
        dil = (lhs_dilation, 1)
        pad = (padding[0], (0, 0))
    else:
        kernel = w2.reshape(K, 1, 1, L)
        strides = (1, stride)
        dil = (1, lhs_dilation)
        pad = ((0, 0), padding[0])
    return lax.conv_general_dilated(
        x4,
        kernel,
        window_strides=strides,
        padding=pad,
        lhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=x4.dtype,
    )


def afb1d_multi(x: jnp.ndarray, filts, mode: str, axis: int) -> jnp.ndarray:
    """Single-axis analysis bank with an arbitrary filter stack.

    x: (N,C,H,W), filts: K 1-D filters (pre-flipped, equal length) ->
    (N, C, K, H', W').  One channel-folded dense conv — K filters ride
    a single XLA convolution (the TPU-native form of the reference's
    grouped quad packing, `dtcwt/lowlevel2.py:259-374`).

    Mirrors reference `afb1d` (`dwt/lowlevel.py:91-172`): same pad
    formula ``p = 2*(outsize-1) - N + L`` and the same periodization
    roll/fold.
    """
    axis = axis % 4
    assert axis in (2, 3)
    N = x.shape[axis]
    L = int(filts[0].shape[-1])
    L2 = L // 2
    xf, n, c = _fold_channels(x)
    h = jnp.stack([jnp.asarray(f, x.dtype) for f in filts], axis=0)

    if mode in ("per", "periodization"):
        if N % 2 == 1:
            edge = lax.slice_in_dim(xf, N - 1, N, axis=axis)
            xf = jnp.concatenate([xf, edge], axis=axis)
            N += 1
        xf = jnp.roll(xf, -L2, axis=axis)
        lohi = _conv_1d_along(xf, h, axis, stride=2, padding=((L - 1, L - 1),))
        N2 = N // 2
        head = lax.slice_in_dim(lohi, 0, L2, axis=axis) + \
            lax.slice_in_dim(lohi, N2, N2 + L2, axis=axis)
        body = lax.slice_in_dim(lohi, L2, N2, axis=axis)
        lohi = jnp.concatenate([head, body], axis=axis)
    else:
        outsize = dwt_coeff_len(N, L, mode=mode)
        p = 2 * (outsize - 1) - N + L
        if mode == "zero":
            pad = ((p // 2, p - p // 2),)
            lohi = _conv_1d_along(xf, h, axis, stride=2, padding=pad)
        elif mode in ("symmetric", "reflect", "periodic", "replicate"):
            xf = wpad(xf, (p // 2, (p + 1) // 2), mode, axis)
            lohi = _conv_1d_along(xf, h, axis, stride=2)
        else:
            raise ValueError(f"Unknown pad mode: {mode}")

    return lohi.reshape(n, c, len(filts), lohi.shape[2], lohi.shape[3])


def afb1d(x: jnp.ndarray, h0: jnp.ndarray, h1: jnp.ndarray, mode: str,
          axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-axis analysis bank. x: (N,C,H,W) -> (lo, hi) each (N,C,H',W').

    Filters must already be flipped (prep_filt_afb1d)."""
    out = afb1d_multi(x, (h0, h1), mode, axis)
    return out[:, :, 0], out[:, :, 1]


def sfb1d(lo: jnp.ndarray, hi: jnp.ndarray, g0: jnp.ndarray, g1: jnp.ndarray,
          mode: str, axis: int) -> jnp.ndarray:
    """Single-axis synthesis bank (reference `sfb1d`, `dwt/lowlevel.py:226-271`).

    The reference's two stride-2 conv_transposes (+ their sum) collapse
    into ONE input-dilated correlation: (lo, hi) become two input
    channels of a (1, 2, L) kernel holding the flipped synthesis
    filters, so the cross-channel reduction performs the lo+hi sum
    inside the conv — a single fused op on the TPU conv engine.

    conv_transpose(stride 2, crop p=L-2) == lhs_dilation=2 correlation
    with flipped filters and symmetric pad L-1-p = 1.
    """
    axis = axis % 4
    assert axis in (2, 3)
    L = int(g0.shape[-1])
    n, c = lo.shape[0], lo.shape[1]
    x = jnp.stack([lo, hi], axis=2).reshape(n * c, 2, lo.shape[2], lo.shape[3])
    g = jnp.stack([jnp.asarray(g0, lo.dtype)[::-1],
                   jnp.asarray(g1, lo.dtype)[::-1]], axis=0)  # (2, L)

    periodized = mode in ("per", "periodization")
    pad_amt = L - 1 if periodized else 1
    if axis == 2:
        kernel = g.reshape(1, 2, L, 1)
        dil = (2, 1)
        pad = ((pad_amt, pad_amt), (0, 0))
    else:
        kernel = g.reshape(1, 2, 1, L)
        dil = (1, 2)
        pad = ((0, 0), (pad_amt, pad_amt))
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=lo.dtype,
    )
    if periodized:
        Nout = 2 * lo.shape[axis]
        head = lax.slice_in_dim(y, 0, L - 2, axis=axis) + \
            lax.slice_in_dim(y, Nout, Nout + L - 2, axis=axis)
        body = lax.slice_in_dim(y, L - 2, Nout, axis=axis)
        y = jnp.concatenate([head, body], axis=axis)
        y = jnp.roll(y, 1 - L // 2, axis=axis)
    return y.reshape(n, c, y.shape[2], y.shape[3])


# ---------------------------------------------------------------------------
# Non-separable single-level 2-D transforms (reference alternates
# `afb2d_nonsep`/`sfb2d_nonsep`, dwt/lowlevel.py:524-597,746-798):
# instead of row-then-column 1-D banks, the four subbands come from ONE
# dense convolution with the four 2-D outer-product point-spread
# functions.  Experimental in the reference (its models never call
# them) but part of the W4 capability surface; on TPU the 4-output
# dense conv is a single MXU-friendly op.
# ---------------------------------------------------------------------------


def prep_filt_afb2d_nonsep(wave) -> np.ndarray:
    """(4, Ly, Lx) float32 stack [ll, lh, hl, hh] of mirrored 2-D psfs
    (reference prep_filt_afb2d_nonsep, dwt/lowlevel.py:801-833).

    Built from the pre-flipped 1-D analysis filters, so
    outer(flip(h0), flip(h0)) == the reference's ll[::-1, ::-1]."""
    h0_col, h1_col, h0_row, h1_row = prep_filt_afb2d(wave)
    return np.stack([
        np.outer(h0_col, h0_row),   # ll
        np.outer(h1_col, h0_row),   # lh
        np.outer(h0_col, h1_row),   # hl
        np.outer(h1_col, h1_row),   # hh
    ]).astype(np.float32)


def prep_filt_sfb2d_nonsep(wave) -> np.ndarray:
    """(4, Ly, Lx) float32 [ll, lh, hl, hh] synthesis psfs, UNflipped
    (reference prep_filt_sfb2d_nonsep, dwt/lowlevel.py:836-867; its
    conv_transpose consumer acts as plain convolution)."""
    g0_col, g1_col, g0_row, g1_row = prep_filt_sfb2d(wave)
    return np.stack([
        np.outer(g0_col, g0_row),
        np.outer(g1_col, g0_row),
        np.outer(g0_col, g1_row),
        np.outer(g1_col, g1_row),
    ]).astype(np.float32)


def _fold_axis(y: jnp.ndarray, n2: int, l2: int, axis: int) -> jnp.ndarray:
    """Periodization wrap: head rows/cols absorb the tail, keep n2."""
    head = lax.slice_in_dim(y, 0, l2, axis=axis) + \
        lax.slice_in_dim(y, n2, n2 + l2, axis=axis)
    body = lax.slice_in_dim(y, l2, n2, axis=axis)
    return jnp.concatenate([head, body], axis=axis)


def afb2d_nonsep(x: jnp.ndarray, wave="haar", mode: str = "zero"
                 ) -> jnp.ndarray:
    """One-level 2-D analysis, non-separable formulation (reference
    `afb2d_nonsep`, dwt/lowlevel.py:524-597).

    x: (N, C, H, W) -> (N, C, 4, H', W') with bands (ll, lh, hl, hh).
    `wave` is a wavelet name or a pre-built (4, Ly, Lx) psf stack from
    :func:`prep_filt_afb2d_nonsep`.  Channels fold into the batch so
    XLA sees one dense 4-output conv (no grouped conv)."""
    f = wave if isinstance(wave, (np.ndarray, jnp.ndarray)) else \
        prep_filt_afb2d_nonsep(wave)
    Ly, Lx = int(f.shape[-2]), int(f.shape[-1])
    Ny, Nx = x.shape[2], x.shape[3]
    xf, n, c = _fold_channels(x)
    kernel = jnp.asarray(f, x.dtype)[:, None]        # (4, 1, Ly, Lx)

    def conv(xp, pad):
        return lax.conv_general_dilated(
            xp, kernel, window_strides=(2, 2), padding=pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=x.dtype)

    if mode in ("per", "periodization"):
        if Ny % 2 == 1:
            xf = jnp.concatenate(
                [xf, lax.slice_in_dim(xf, Ny - 1, Ny, axis=2)], axis=2)
            Ny += 1
        if Nx % 2 == 1:
            xf = jnp.concatenate(
                [xf, lax.slice_in_dim(xf, Nx - 1, Nx, axis=3)], axis=3)
            Nx += 1
        xf = jnp.roll(jnp.roll(xf, -(Ly // 2), axis=2), -(Lx // 2), axis=3)
        y = conv(xf, ((Ly - 1, Ly - 1), (Lx - 1, Lx - 1)))
        y = _fold_axis(y, Ny // 2, Ly // 2, axis=2)
        y = _fold_axis(y, Nx // 2, Lx // 2, axis=3)
    elif mode in ("zero", "symmetric", "reflect", "periodic", "replicate"):
        p1 = 2 * (dwt_coeff_len(Ny, Ly, mode=mode) - 1) - Ny + Ly
        p2 = 2 * (dwt_coeff_len(Nx, Lx, mode=mode) - 1) - Nx + Lx
        if mode == "zero":
            y = conv(xf, ((p1 // 2, (p1 + 1) // 2),
                          (p2 // 2, (p2 + 1) // 2)))
        else:
            xf = wpad(xf, (p1 // 2, (p1 + 1) // 2), mode, axis=2)
            xf = wpad(xf, (p2 // 2, (p2 + 1) // 2), mode, axis=3)
            y = conv(xf, ((0, 0), (0, 0)))
    else:
        raise ValueError(f"Unknown pad mode: {mode}")
    return y.reshape(n, c, 4, y.shape[2], y.shape[3])


def sfb2d_nonsep(coeffs: jnp.ndarray, wave="haar", mode: str = "zero"
                 ) -> jnp.ndarray:
    """One-level 2-D synthesis from (N, C, 4, H, W) band stacks
    (reference `sfb2d_nonsep`, dwt/lowlevel.py:746-798).

    The reference's 4-input conv_transpose becomes one lhs-dilated
    correlation with the flipped psfs — the band sum rides the conv's
    input-channel reduction (same trick as :func:`sfb1d`)."""
    f = wave if isinstance(wave, (np.ndarray, jnp.ndarray)) else \
        prep_filt_sfb2d_nonsep(wave)
    Ly, Lx = int(f.shape[-2]), int(f.shape[-1])
    n, c = coeffs.shape[0], coeffs.shape[1]
    Ny, Nx = coeffs.shape[-2], coeffs.shape[-1]
    x = coeffs.reshape(n * c, 4, Ny, Nx)
    kernel = jnp.asarray(f, coeffs.dtype)[None, :, ::-1, ::-1]  # (1,4,Ly,Lx)

    periodized = mode in ("per", "periodization")
    pad = (Ly - 1, Lx - 1) if periodized else (1, 1)
    y = lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=coeffs.dtype)
    if periodized:
        y = _fold_axis(y, 2 * Ny, Ly - 2, axis=2)
        y = _fold_axis(y, 2 * Nx, Lx - 2, axis=3)
        y = jnp.roll(jnp.roll(y, 1 - Ly // 2, axis=2), 1 - Lx // 2, axis=3)
    return y.reshape(n, c, y.shape[2], y.shape[3])
