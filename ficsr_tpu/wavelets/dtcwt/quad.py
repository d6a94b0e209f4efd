"""DTCWT as four fully-decimated DWT trees — the reference's
"alternative implementation" (`dtcwt/lowlevel2.py:17-155` DTCWTForward2 /
DTCWTInverse2, `:259-443` quad_afb2d / quad_afb2d_nonsep).

TPU-native formulation: the reference batches the four trees into
grouped CUDA convolutions (8C- and 16C-group conv2d).  Grouped convs
with 1-2 channels per group map poorly onto the TPU conv engine, so
here the quad packing exploits the filter structure instead — the four
trees are the outer product {col tree a,b} x {row tree a,b}, so ONE
channel-folded dense conv with the 4 distinct column filters followed by
ONE with the 4 distinct row filters yields all 16 subband combinations
(identical FLOPs, no groups, XLA-fusable).  Levels 2+ of
DTCWTForward2/Inverse2 run per-tree on the tree-specific lowpasses via
the shared separable engine (the reference's own formulation there is
four independent DWTs).

Filter-bank deviation from the reference API: filters are passed/looked
up by name or 1-D arrays; the torch-specific prep_filt_* tensor packing
(`lowlevel2.py:157-257`) is replaced by this module's internal stacking.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ficsr_tpu.wavelets.dtcwt import coeffs as _coeffs
from ficsr_tpu.wavelets.dtcwt.cplxdual import _afb2d, _sfb2d, pm
from ficsr_tpu.wavelets.lowlevel import afb1d_multi, dwt_coeff_len, wpad

__all__ = ["DTCWTForward2", "DTCWTInverse2", "quad_afb2d",
           "quad_afb2d_nonsep"]

_SQRT2 = math.sqrt(2.0)


def _flip(a):
    return np.asarray(a, dtype=np.float64).ravel()[::-1].astype(np.float32)


def _fwd(a):
    return np.asarray(a, dtype=np.float64).ravel().astype(np.float32)


def _stack_orientations(w):
    """w[m][n] = [b0, b1, b2] per-tree DWT bands -> (N, 6, C, H, W, 2)
    complex 6-orientation stack (reference lowlevel2.py:68-81)."""
    deg75r, deg105i = pm(w[0][0][1], w[1][1][1])
    deg105r, deg75i = pm(w[0][1][1], w[1][0][1])
    deg15r, deg165i = pm(w[0][0][0], w[1][1][0])
    deg165r, deg15i = pm(w[0][1][0], w[1][0][0])
    deg135r, deg45i = pm(w[0][0][2], w[1][1][2])
    deg45r, deg135i = pm(w[0][1][2], w[1][0][2])
    yhr = jnp.stack((deg15r, deg45r, deg75r, deg105r, deg135r, deg165r),
                    axis=1)
    yhi = jnp.stack((deg15i, deg45i, deg75i, deg105i, deg135i, deg165i),
                    axis=1)
    return jnp.stack((yhr, yhi), axis=-1)


def _unstack_orientations(yh, ref_band_swap: bool = False):
    """Inverse of :func:`_stack_orientations`.

    The reference's version (lowlevel2.py:119-136) has two bugs that
    break reconstruction (its own round-trip error is ~4.0 on
    unit-normal input; measured, dead experimental code):
      1. it writes the deg75/105 content into band slot 0 while its own
         forward sources deg75 from band 1 (an LH/HL swap), and
      2. it assigns the deg45/135 pms to crossed trees — forward has
         deg135r,deg45i = pm(w00, w11) but the inverse feeds
         pm(deg45r, deg135i) back into (w00, w11).
    Default is the CORRECT pairing (verified perfect reconstruction);
    ``ref_band_swap=True`` reproduces the reference bugs bit-for-bit
    for parity testing."""
    w = [[[None] * 3 for _ in range(2)] for _ in range(2)]
    if ref_band_swap:
        w[0][0][0], w[1][1][0] = pm(yh[:, 2, ..., 0], yh[:, 3, ..., 1])
        w[0][1][0], w[1][0][0] = pm(yh[:, 3, ..., 0], yh[:, 2, ..., 1])
        w[0][0][1], w[1][1][1] = pm(yh[:, 0, ..., 0], yh[:, 5, ..., 1])
        w[0][1][1], w[1][0][1] = pm(yh[:, 5, ..., 0], yh[:, 0, ..., 1])
        w[0][0][2], w[1][1][2] = pm(yh[:, 1, ..., 0], yh[:, 4, ..., 1])
        w[0][1][2], w[1][0][2] = pm(yh[:, 4, ..., 0], yh[:, 1, ..., 1])
    else:
        w[0][0][1], w[1][1][1] = pm(yh[:, 2, ..., 0], yh[:, 3, ..., 1])
        w[0][1][1], w[1][0][1] = pm(yh[:, 3, ..., 0], yh[:, 2, ..., 1])
        w[0][0][0], w[1][1][0] = pm(yh[:, 0, ..., 0], yh[:, 5, ..., 1])
        w[0][1][0], w[1][0][0] = pm(yh[:, 5, ..., 0], yh[:, 0, ..., 1])
        w[0][0][2], w[1][1][2] = pm(yh[:, 4, ..., 0], yh[:, 1, ..., 1])
        w[0][1][2], w[1][0][2] = pm(yh[:, 1, ..., 0], yh[:, 4, ..., 1])
    return w


class DTCWTForward2:
    """DTCWT built on four DWT trees (reference
    `dtcwt/lowlevel2.py:17-82`).  Returns (lows, yh): lows a 2x2 nested
    list of per-tree lowpasses, yh a list over scales of
    (N, 6, C, H_j, W_j, 2) oriented complex subbands — the same layout
    as the reference."""

    def __init__(self, biort: str = "farras", qshift: str = "qshift_a",
                 J: int = 3, mode: str = "symmetric"):
        self.biort, self.qshift, self.J, self.mode = biort, qshift, J, mode
        h0a1, h0b1, _, _, h1a1, h1b1, _, _ = _coeffs.level1(
            biort, compact=False) if isinstance(biort, str) else biort
        self._lvl1 = {0: (_flip(h0a1), _flip(h1a1)),
                      1: (_flip(h0b1), _flip(h1b1))}
        if J > 1:
            h0a, h0b, _, _, h1a, h1b, _, _ = _coeffs.qshift(qshift) \
                if isinstance(qshift, str) else qshift
            self._lvl2 = {0: (_flip(h0a), _flip(h1a)),
                          1: (_flip(h0b), _flip(h1b))}

    def __call__(self, x: jnp.ndarray):
        x = x / 2.0
        J = self.J
        w = [[[None, None] for _ in range(2)] for _ in range(J)]
        lows = [[None, None] for _ in range(2)]
        # reference DWTForward's wave 4-tuple applies its FIRST filter
        # pair along the last (row) axis, so tree index m maps to row
        # filters and n to column filters (verified empirically vs
        # DWTForward(wave=(a,a,b,b)))
        for m in range(2):          # row tree
            for n in range(2):      # column tree
                ll, bands = _afb2d(x, self._lvl1[n], self._lvl1[m],
                                   self.mode)
                w[0][m][n] = bands
                for j in range(1, J):
                    ll, bands = _afb2d(ll, self._lvl2[n], self._lvl2[m],
                                       self.mode)
                    w[j][m][n] = bands
                lows[m][n] = ll
        yh = [_stack_orientations(w[j]) for j in range(J)]
        return lows, yh


class DTCWTInverse2:
    """Inverse of :class:`DTCWTForward2` (reference
    `dtcwt/lowlevel2.py:85-155`)."""

    def __init__(self, biort: str = "farras", qshift: str = "qshift_a",
                 mode: str = "symmetric", ref_band_swap: bool = False):
        self.biort, self.qshift, self.mode = biort, qshift, mode
        self.ref_band_swap = ref_band_swap
        _, _, g0a1, g0b1, _, _, g1a1, g1b1 = _coeffs.level1(
            biort, compact=False) if isinstance(biort, str) else biort
        self._lvl1 = {0: (_fwd(g0a1), _fwd(g1a1)),
                      1: (_fwd(g0b1), _fwd(g1b1))}
        _, _, g0a, g0b, _, _, g1a, g1b = _coeffs.qshift(qshift) \
            if isinstance(qshift, str) else qshift
        self._lvl2 = {0: (_fwd(g0a), _fwd(g1a)),
                      1: (_fwd(g0b), _fwd(g1b))}

    def __call__(self, coeffs):
        yl, yh = coeffs
        J = len(yh)
        w = [[[None] * J for _ in range(2)] for _ in range(2)]
        for j in range(J):
            wj = _unstack_orientations(yh[j], self.ref_band_swap)
            for m in range(2):
                for n in range(2):
                    w[m][n][j] = wj[m][n]
        y = None
        for m in range(2):          # row tree (see DTCWTForward2 note)
            for n in range(2):      # column tree
                lo = yl[m][n]
                for j in range(J - 1, 0, -1):
                    lo = _sfb2d(lo, w[m][n][j], self._lvl2[n], self._lvl2[m],
                                self.mode)
                lo = _sfb2d(lo, w[m][n][0], self._lvl1[n], self._lvl1[m],
                            self.mode)
                y = lo if y is None else y + lo
        return y / 2.0


# ---------------------------------------------------------------------------
# Single-level quad filter bank (reference quad_afb2d, lowlevel2.py:259-372)
# ---------------------------------------------------------------------------


def quad_afb2d(x: jnp.ndarray, h0a, h1a, h0b, h1b, mode: str = "zero"):
    """One level of all four DTCWT trees at once.

    The reference packs the four trees into grouped torch convs
    (`lowlevel2.py:259-340`, cols (8C,1,L,1) groups=C then rows
    (16C,1,1,L) groups=8C).  Here the identical 16 subbands come from
    the {col a,b} x {row a,b} outer product: one dense 4-filter conv
    per axis, channels folded into the batch.

    Returns (yl, yh) in the reference's exact layout: yl is the four
    tree lowpasses sample-interleaved into an (N, C, H, W) image
    (`lowlevel2.py:367-372`), yh is (N, 6, C, H/2, W/2, 2) oriented
    complex subbands.
    """
    x = x / 2.0
    filts = (_flip(h0a), _flip(h1a), _flip(h0b), _flip(h1b))
    cols = afb1d_multi(x, filts, mode, axis=2)          # (N, C, 4, H', W)
    n, c = cols.shape[0], cols.shape[1]
    colsf = cols.reshape(n, c * 4, cols.shape[3], cols.shape[4])
    y = afb1d_multi(colsf, filts, mode, axis=3)         # (N, C*4, 4, H', W')
    hh, ww = y.shape[-2], y.shape[-1]
    y = y.reshape(n, c, 2, 2, 2, 2, hh, ww)
    # dims: (col tree m, col band, row tree nn, row band)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6, 7)
    # -> (N, C, m, nn, col band, row band, H, W)

    # oriented complex subbands — band order [hi-col*lo-row,
    # lo-col*hi-row, hi*hi], the DWT order _stack_orientations expects
    # (deg15 sources quad band 1, deg75 band 0: lowlevel2.py:358-363)
    w = [[[y[:, :, m, nn, 1, 0], y[:, :, m, nn, 0, 1],
           y[:, :, m, nn, 1, 1]] for nn in range(2)] for m in range(2)]
    yh = _stack_orientations(w)

    # lowpass sample-interleave (reference lowlevel2.py:367-372): tree
    # (m, n) lands on output parity (row 1-m, col 1-n)
    ll = y[:, :, :, :, 0, 0]                            # (N, C, m, n, H, W)
    row_a = jnp.stack([ll[:, :, 0, 1], ll[:, :, 0, 0]], axis=-1)
    row_b = jnp.stack([ll[:, :, 1, 1], ll[:, :, 1, 0]], axis=-1)
    row_a = row_a.reshape(n, c, hh, ww * 2)
    row_b = row_b.reshape(n, c, hh, ww * 2)
    yl = jnp.stack([row_b, row_a], axis=-2).reshape(n, c, hh * 2, ww * 2)
    return yl, yh


def quad_afb2d_nonsep(x: jnp.ndarray, filts: Sequence[np.ndarray],
                      mode: str = "zero"):
    """Single non-separable conv form (reference `lowlevel2.py:374-443`):
    K pre-built 2-D point-spread kernels applied in one strided conv.

    filts: array-like (K, Ly, Lx), already mirror-imaged like the
    reference's prep (kernels are CORRELATED against the input).
    Returns (yl, yh) = (band 0, bands 1:) per channel, reference layout
    (N, C, H', W') and (N, C, K-1, H', W').
    """
    from jax import lax

    f = jnp.asarray(np.asarray(filts, dtype=np.float32))
    if f.ndim == 4:                     # tolerate the torch (K,1,Ly,Lx)
        f = f[:, 0]
    k, ly, lx = f.shape
    n, c, ny, nx = x.shape
    xf = x.reshape(n * c, 1, ny, nx)

    if mode in ("per", "periodization"):
        if ny % 2 == 1:
            xf = jnp.concatenate([xf, xf[:, :, -1:]], axis=2)
            ny += 1
        if nx % 2 == 1:
            xf = jnp.concatenate([xf, xf[:, :, :, -1:]], axis=3)
            nx += 1
        xf = jnp.roll(jnp.roll(xf, -(ly // 2), axis=2), -(lx // 2), axis=3)
        y = lax.conv_general_dilated(
            xf, f[:, None], window_strides=(2, 2),
            padding=((ly - 1, ly - 1), (lx - 1, lx - 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        ny2, nx2 = ny // 2, nx // 2
        y = y.at[:, :, :ly // 2].add(y[:, :, ny2:ny2 + ly // 2])
        y = y.at[:, :, :, :lx // 2].add(y[:, :, :, nx2:nx2 + lx // 2])
        y = y[:, :, :ny2, :nx2]
    elif mode in ("zero", "symmetric", "reflect"):
        p1 = 2 * (dwt_coeff_len(ny, ly, mode=mode) - 1) - ny + ly
        p2 = 2 * (dwt_coeff_len(nx, lx, mode=mode) - 1) - nx + lx
        if mode == "zero":
            y = lax.conv_general_dilated(
                xf, f[:, None], window_strides=(2, 2),
                padding=((p1 // 2, p1 - p1 // 2), (p2 // 2, p2 - p2 // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        else:
            xf = wpad(xf, (p1 // 2, (p1 + 1) // 2), mode, axis=2)
            xf = wpad(xf, (p2 // 2, (p2 + 1) // 2), mode, axis=3)
            y = lax.conv_general_dilated(
                xf, f[:, None], window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
    else:
        raise ValueError(f"Unknown pad type: {mode}")

    y = y.reshape(n, c, k, y.shape[-2], y.shape[-1])
    return y[:, :, 0], y[:, :, 1:]
