"""DTCWT filter primitives in JAX (reference `dtcwt/lowlevel.py:58-295`).

All functions take ORIGINAL (unflipped) 1-D filter arrays; correlation
with the spatially flipped taps reproduces the reference's
prep_filt(h)[::-1] + F.conv2d composition exactly.

Padding uses precomputed *static* symmetric-reflection index vectors
(reference `symm_pad_1d`, utils.py:166-174) gathered with jnp.take —
index arrays are compile-time constants, so XLA lowers them to cheap
slices/concats on TPU.

The two-tree (de/interpolating) filters coldfilt/rowdfilt and
colifilt/rowifilt run their per-tree streams through ONE grouped
convolution, and the tree interleave is a stack+reshape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "symm_pad_1d",
    "colfilter", "rowfilter",
    "coldfilt", "rowdfilt",
    "colifilt", "rowifilt",
    "q2c", "c2q",
]

_SQRT2 = np.sqrt(2.0)


def reflect(x, minx, maxx):
    """Kingsbury symmetric-reflection index arithmetic
    (reference utils.py:146-163)."""
    x = np.asanyarray(x)
    rng = maxx - minx
    rng_by_2 = 2 * rng
    mod = np.fmod(x - minx, rng_by_2)
    normed_mod = np.where(mod < 0, mod + rng_by_2, mod)
    out = np.where(normed_mod >= rng, rng_by_2 - normed_mod, normed_mod) + minx
    return np.array(out, dtype=x.dtype)


@functools.lru_cache(maxsize=None)
def symm_pad_1d(l: int, m: int) -> np.ndarray:
    """Symmetric padding index vector of length l + 2m."""
    return reflect(np.arange(-m, l + m, dtype="int32"), -0.5, l - 0.5)


def _taps(h, flip: bool = True) -> np.ndarray:
    t = np.asarray(h, dtype=np.float64).ravel().astype(np.float32)
    return t[::-1].copy() if flip else t


def _conv_axis(x: jnp.ndarray, kernel: np.ndarray, axis: int,
               stride: int = 1, groups: int = 1) -> jnp.ndarray:
    """Correlate NCHW x with kernel (O, I, L) along `axis`."""
    o, i, L = kernel.shape
    k = jnp.asarray(kernel, x.dtype)
    if axis == 2:
        k = k.reshape(o, i, L, 1)
        s = (stride, 1)
    else:
        k = k.reshape(o, i, 1, L)
        s = (1, stride)
    return lax.conv_general_dilated(
        x, k, s, ((0, 0), (0, 0)),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _take(x: jnp.ndarray, idx: np.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _fold(x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    b, ch = x.shape[0], x.shape[1]
    return x.reshape(b * ch, 1, x.shape[2], x.shape[3]), b, ch


def _filter_same(x: jnp.ndarray, h, axis: int, mode: str) -> jnp.ndarray:
    """colfilter/rowfilter (reference lowlevel.py:70-94): same-size
    single-tree filtering with symmetric (or zero) padding."""
    taps = _taps(h)
    M = len(taps)
    m = M // 2
    xf, b, ch = _fold(x)
    if mode == "symmetric":
        xe = symm_pad_1d(x.shape[axis], m)
        xf = _take(xf, xe, axis)
    else:
        pad = [(0, 0)] * 4
        pad[axis] = (m, m)
        xf = jnp.pad(xf, pad)
    y = _conv_axis(xf, taps.reshape(1, 1, M), axis)
    return y.reshape(b, ch, y.shape[2], y.shape[3])


def colfilter(x: jnp.ndarray, h, mode: str = "symmetric") -> jnp.ndarray:
    return _filter_same(x, h, 2, mode)


def rowfilter(x: jnp.ndarray, h, mode: str = "symmetric") -> jnp.ndarray:
    return _filter_same(x, h, 3, mode)


def _dfilt(x: jnp.ndarray, ha, hb, highpass: bool, axis: int) -> jnp.ndarray:
    """coldfilt/rowdfilt (reference lowlevel.py:97-151): two-tree
    decimation by 2 (each tree decimates by 4, trees interleave)."""
    b, ch = x.shape[0], x.shape[1]
    n = x.shape[axis]
    if n % 4 != 0:
        raise ValueError(
            f"No. of samples along axis {axis} must be a multiple of 4, "
            f"got shape {x.shape}")
    ta, tb = _taps(ha), _taps(hb)
    M = len(ta)
    xe = symm_pad_1d(n, M)
    xa = _take(x, xe[2::2], axis)
    xb = _take(x, xe[3::2], axis)
    # two streams as 2 channels of a grouped conv (groups=2)
    s = jnp.stack([xa, xb], axis=2)  # (b, ch, 2, n', c)
    s = s.reshape(b * ch, 2, s.shape[3], s.shape[4])
    k = np.stack([ta, tb])[:, None, :]  # (2, 1, M)
    y = _conv_axis(s, k, axis, stride=2, groups=2)  # (b*ch, 2, ...)
    ya, yb = y[:, 0], y[:, 1]
    first, second = (yb, ya) if highpass else (ya, yb)
    out = jnp.stack([first, second], axis=axis)  # interleave trees
    n2 = n // 2
    if axis == 2:
        out = out.reshape(b * ch, n2, y.shape[3])
    else:
        out = out.reshape(b * ch, y.shape[2], n2)
    return out.reshape(b, ch, *out.shape[1:])


def coldfilt(x, ha, hb, highpass: bool = False,
             mode: str = "symmetric") -> jnp.ndarray:
    assert mode == "symmetric"
    return _dfilt(x, ha, hb, highpass, 2)


def rowdfilt(x, ha, hb, highpass: bool = False,
             mode: str = "symmetric") -> jnp.ndarray:
    assert mode == "symmetric"
    return _dfilt(x, ha, hb, highpass, 3)


def _ifilt(x: jnp.ndarray, ha, hb, highpass: bool, axis: int) -> jnp.ndarray:
    """colifilt/rowifilt (reference lowlevel.py:154-239): two-tree
    interpolation by 2 via odd/even tap polyphase, 4 streams -> one
    grouped conv -> 4-way interleave."""
    b, ch = x.shape[0], x.shape[1]
    n = x.shape[axis]
    if n % 2 != 0:
        raise ValueError(
            f"No. of samples along axis {axis} must be even, got {x.shape}")
    ta, tb = _taps(ha), _taps(hb)
    M = len(ta)
    m2 = M // 2
    # NB taps are already flipped; odd/even split of the FLIPPED filter
    # matches the reference (it flips in prep_filt then slices).
    hao, hae = ta[1::2], ta[0::2]
    hbo, hbe = tb[1::2], tb[0::2]
    xe = symm_pad_1d(n, m2)

    if m2 % 2 == 0:
        k = np.stack([hae, hbe, hao, hbo])[:, None, :]
        if highpass:
            streams = (xe[1:-2:2], xe[:-2:2], xe[3::2], xe[2::2])
        else:
            streams = (xe[:-2:2], xe[1:-2:2], xe[2::2], xe[3::2])
    else:
        k = np.stack([hao, hbo, hae, hbe])[:, None, :]
        if highpass:
            streams = (xe[2:-1:2], xe[1:-1:2], xe[2:-1:2], xe[1:-1:2])
        else:
            streams = (xe[1:-1:2], xe[2:-1:2], xe[1:-1:2], xe[2:-1:2])

    s = jnp.stack([_take(x, idx, axis) for idx in streams], axis=2)
    s = s.reshape(b * ch, 4, s.shape[3], s.shape[4])
    y = _conv_axis(s, k, axis, groups=4)  # (b*ch, 4, ...)
    parts = [y[:, i] for i in range(4)]
    out = jnp.stack(parts, axis=axis)  # 4-way interleave
    if axis == 2:
        out = out.reshape(b * ch, n * 2, y.shape[3])
    else:
        out = out.reshape(b * ch, y.shape[2], n * 2)
    return out.reshape(b, ch, *out.shape[1:])


def colifilt(x, ha, hb, highpass: bool = False,
             mode: str = "symmetric") -> jnp.ndarray:
    assert mode == "symmetric"
    return _ifilt(x, ha, hb, highpass, 2)


def rowifilt(x, ha, hb, highpass: bool = False,
             mode: str = "symmetric") -> jnp.ndarray:
    assert mode == "symmetric"
    return _ifilt(x, ha, hb, highpass, 3)


def q2c(y: jnp.ndarray):
    """Quads -> two complex subimages (reference lowlevel.py:243-260)."""
    y = y / _SQRT2
    a, b = y[:, :, 0::2, 0::2], y[:, :, 0::2, 1::2]
    c, d = y[:, :, 1::2, 0::2], y[:, :, 1::2, 1::2]
    return ((a - d, b + c), (a + d, b - c))


def c2q(w1, w2) -> jnp.ndarray:
    """Two complex subimages -> quads (reference lowlevel.py:263-295)."""
    w1r, w1i = w1
    w2r, w2i = w2
    x1 = w1r + w2r
    x2 = w1i + w2i
    x3 = w1i - w2i
    x4 = -w1r + w2r
    b, ch, r, c = w1r.shape
    quad = jnp.stack(
        [jnp.stack([x1, x2], axis=-1), jnp.stack([x3, x4], axis=-1)],
        axis=-3,
    )  # (b, ch, r, 2, c, 2)
    return quad.reshape(b, ch, r * 2, c * 2) / _SQRT2
