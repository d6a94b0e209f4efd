"""Complex dual-tree 2-D DWT via four fully-decimated trees
(Selesnick's formulation; reference `dtcwt/lowlevel2.py:444-581`
`cplxdual2D`/`icplxdual2D` — the capability behind the reference's
"alternative DTCWT implementation", SURVEY §2b W10).

Four separable DWTs (tree pairs a/b per axis) whose sums/differences
form the real/imaginary parts of six oriented complex subbands.  Built
on the same afb1d/sfb1d engine as the primary DWT; the quad-filter
conv packing of the reference (a CUDA batching experiment used only by
its profiling scripts) is not reproduced — XLA fuses the four trees on
its own.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp
import numpy as np

from ficsr_tpu.wavelets.dtcwt import coeffs as _coeffs
from ficsr_tpu.wavelets.lowlevel import afb1d, sfb1d

__all__ = ["cplxdual2d", "icplxdual2d"]

_SQRT2 = math.sqrt(2.0)


def _flip(a):
    return np.asarray(a, dtype=np.float64).ravel()[::-1].astype(np.float32)


def _fwd(a):
    return np.asarray(a, dtype=np.float64).ravel().astype(np.float32)


def pm(a, b):
    return (a + b) / _SQRT2, (a - b) / _SQRT2


def _afb2d(x, col_filts, row_filts, mode):
    """Row filtering then column filtering; returns (ll, [lh, hl, hh])
    with lh = hi-col/lo-row (reference channel order, lowlevel.py:344)."""
    h0r, h1r = row_filts
    h0c, h1c = col_filts
    lo_r, hi_r = afb1d(x, h0r, h1r, mode=mode, axis=3)
    ll, lh = afb1d(lo_r, h0c, h1c, mode=mode, axis=2)
    hl, hh = afb1d(hi_r, h0c, h1c, mode=mode, axis=2)
    return ll, [lh, hl, hh]


def _sfb2d(ll, bands, col_filts, row_filts, mode):
    lh, hl, hh = bands
    g0c, g1c = col_filts
    g0r, g1r = row_filts
    lo = sfb1d(ll, lh, g0c, g1c, mode=mode, axis=2)
    hi = sfb1d(hl, hh, g0c, g1c, mode=mode, axis=2)
    return sfb1d(lo, hi, g0r, g1r, mode=mode, axis=3)


def cplxdual2d(x: jnp.ndarray, J: int, level1: str = "farras",
               qshift: str = "qshift_a", mode: str = "periodization",
               mag: bool = False):
    """x: (N,C,H,W) -> (lows 2x2 nested list, yh list over scales of
    (N, 6, C, H_j, W_j, 2)) — reference cplxdual2D semantics."""
    x = x / 2.0
    h0a1, h0b1, _, _, h1a1, h1b1, _, _ = _coeffs.level1(level1, compact=False)
    h0a, h0b, _, _, h1a, h1b, _, _ = _coeffs.qshift(qshift)

    lvl1 = {0: (_flip(h0a1), _flip(h1a1)), 1: (_flip(h0b1), _flip(h1b1))}
    lvl2 = {0: (_flip(h0a), _flip(h1a)), 1: (_flip(h0b), _flip(h1b))}

    w = [[[None, None] for _ in range(2)] for _ in range(J)]
    lows = [[None, None] for _ in range(2)]
    for m in range(2):          # column tree
        for n in range(2):      # row tree
            ll, bands = _afb2d(x, lvl1[m], lvl1[n], mode)
            # reference stores [HL, LH, HH] (lowlevel2.py:491)
            w[0][m][n] = [bands[1], bands[0], bands[2]]
            for j in range(1, J):
                ll, bands = _afb2d(ll, lvl2[m], lvl2[n], mode)
                w[j][m][n] = [bands[1], bands[0], bands[2]]
            lows[m][n] = ll

    yh: List[jnp.ndarray] = [None] * J
    for j in range(J):
        deg75r, deg105i = pm(w[j][0][0][0], w[j][1][1][0])
        deg105r, deg75i = pm(w[j][0][1][0], w[j][1][0][0])
        deg15r, deg165i = pm(w[j][0][0][1], w[j][1][1][1])
        deg165r, deg15i = pm(w[j][0][1][1], w[j][1][0][1])
        deg135r, deg45i = pm(w[j][0][0][2], w[j][1][1][2])
        deg45r, deg135i = pm(w[j][0][1][2], w[j][1][0][2])
        yhr = jnp.stack([deg15r, deg45r, deg75r, deg105r, deg135r, deg165r],
                        axis=1)
        yhi = jnp.stack([deg15i, deg45i, deg75i, deg105i, deg135i, deg165i],
                        axis=1)
        if mag:
            yh[j] = jnp.sqrt(yhr ** 2 + yhi ** 2 + 0.01) - math.sqrt(0.01)
        else:
            yh[j] = jnp.stack([yhr, yhi], axis=-1)
    return lows, yh


def icplxdual2d(yl, yh, level1: str = "farras", qshift: str = "qshift_a",
                mode: str = "periodization") -> jnp.ndarray:
    _, _, g0a1, g0b1, _, _, g1a1, g1b1 = _coeffs.level1(level1, compact=False)
    _, _, g0a, g0b, _, _, g1a, g1b = _coeffs.qshift(qshift)
    lvl1 = {0: (_fwd(g0a1), _fwd(g1a1)), 1: (_fwd(g0b1), _fwd(g1b1))}
    lvl2 = {0: (_fwd(g0a), _fwd(g1a)), 1: (_fwd(g0b), _fwd(g1b))}

    J = len(yh)
    w = [[[[None] * 3 for _ in range(2)] for _ in range(2)] for _ in range(J)]
    for j in range(J):
        h = yh[j]
        w[j][0][0][0], w[j][1][1][0] = pm(h[:, 2, ..., 0], h[:, 3, ..., 1])
        w[j][0][1][0], w[j][1][0][0] = pm(h[:, 3, ..., 0], h[:, 2, ..., 1])
        w[j][0][0][1], w[j][1][1][1] = pm(h[:, 0, ..., 0], h[:, 5, ..., 1])
        w[j][0][1][1], w[j][1][0][1] = pm(h[:, 5, ..., 0], h[:, 0, ..., 1])
        # NB: the forward maps (w[0][0], w[1][1]) -> (135r, 45i) and
        # (w[0][1], w[1][0]) -> (45r, 135i); the reference's icplxdual2D
        # crosses this pair (its inverse is unrunnable anyway —
        # lowlevel2.py:570 calls sfb2d with the wrong signature), so we
        # invert the forward faithfully instead.
        w[j][0][0][2], w[j][1][1][2] = pm(h[:, 4, ..., 0], h[:, 1, ..., 1])
        w[j][0][1][2], w[j][1][0][2] = pm(h[:, 1, ..., 0], h[:, 4, ..., 1])

    y = None
    for m in range(2):
        for n in range(2):
            lo = yl[m][n]
            for j in range(J - 1, 0, -1):
                hl, lh, hh = w[j][m][n]
                lo = _sfb2d(lo, [lh, hl, hh], lvl2[m], lvl2[n], mode)
            hl, lh, hh = w[0][m][n]
            lo = _sfb2d(lo, [lh, hl, hh], lvl1[m], lvl1[n], mode)
            y = lo if y is None else y + lo
    return y / 2.0
