"""DTCWT per-level transforms with analytic-adjoint VJPs
(reference `dtcwt/transform_funcs.py:98-488`).

The six orientations are packed (15, 45, 75, 105, 135, 165 degrees) at
`o_dim` and the real/imag pair at `ri_dim`, matching
`highs_to_orientations` (transform_funcs.py:61-95).  Backward of each
forward level is the corresponding inverse level with the same
(level-1) or tree-swapped (level-2+) filters, as in FWD_J1/FWD_J2PLUS/
INV_J1/INV_J2PLUS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets.dtcwt.lowlevel import (
    c2q,
    coldfilt,
    colfilter,
    colifilt,
    q2c,
    rowdfilt,
    rowfilter,
    rowifilt,
)

__all__ = [
    "get_dimensions5", "get_dimensions6",
    "highs_to_orientations", "orientations_to_highs",
    "fwd_j1", "fwd_j2plus", "inv_j1", "inv_j2plus",
    "fwd_j1_vjp", "fwd_j2plus_vjp", "inv_j1_vjp", "inv_j2plus_vjp",
]


def get_dimensions5(o_dim: int, ri_dim: int):
    """(reference transform_funcs.py:10-29)"""
    o_dim = o_dim % 6
    ri_dim = ri_dim % 6
    if ri_dim < o_dim:
        o_dim -= 1
    if o_dim == 4:
        h_dim, w_dim = 2, 3
    elif o_dim == 3:
        h_dim, w_dim = 2, 4
    else:
        h_dim, w_dim = 3, 4
    return o_dim, ri_dim, h_dim, w_dim


def get_dimensions6(o_dim: int, ri_dim: int):
    """(reference transform_funcs.py:32-58)"""
    o_dim = o_dim % 6
    ri_dim = ri_dim % 6
    if ri_dim < o_dim:
        o_dim -= 1
    if o_dim >= 3 and ri_dim >= 3:
        h_dim = 2
    elif o_dim >= 4 or ri_dim >= 4:
        h_dim = 3
    else:
        h_dim = 4
    if o_dim >= 4 and ri_dim >= 4:
        w_dim = 3
    elif o_dim >= 4 or ri_dim >= 4:
        w_dim = 4
    else:
        w_dim = 5
    return o_dim, ri_dim, h_dim, w_dim


def highs_to_orientations(lh, hl, hh, o_dim):
    (d15r, d15i), (d165r, d165i) = q2c(lh)
    (d45r, d45i), (d135r, d135i) = q2c(hh)
    (d75r, d75i), (d105r, d105i) = q2c(hl)
    reals = jnp.stack([d15r, d45r, d75r, d105r, d135r, d165r], axis=o_dim)
    imags = jnp.stack([d15i, d45i, d75i, d105i, d135i, d165i], axis=o_dim)
    return reals, imags


def orientations_to_highs(reals, imags, o_dim):
    parts_r = [jax.lax.index_in_dim(reals, i, o_dim, keepdims=False)
               for i in range(6)]
    parts_i = [jax.lax.index_in_dim(imags, i, o_dim, keepdims=False)
               for i in range(6)]
    d15r, d45r, d75r, d105r, d135r, d165r = parts_r
    d15i, d45i, d75i, d105i, d135i, d165i = parts_i
    lh = c2q((d15r, d15i), (d165r, d165i))
    hl = c2q((d75r, d75i), (d105r, d105i))
    hh = c2q((d45r, d45i), (d135r, d135i))
    return lh, hl, hh


def fwd_j1(x, h0, h1, skip_hps, o_dim, mode):
    """(reference transform_funcs.py:98-121)"""
    if not skip_hps:
        lo = rowfilter(x, h0, mode)
        hi = rowfilter(x, h1, mode)
        ll = colfilter(lo, h0, mode)
        lh = colfilter(lo, h1, mode)
        hl = colfilter(hi, h0, mode)
        hh = colfilter(hi, h1, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = colfilter(rowfilter(x, h0, mode), h0, mode)
        highr = highi = None
    return ll, highr, highi


def inv_j1(ll, highr, highi, g0, g1, o_dim, h_dim, w_dim, mode):
    """(reference transform_funcs.py:152-184)"""
    if highr is None:
        return rowfilter(colfilter(ll, g0, mode), g0, mode)
    lh, hl, hh = orientations_to_highs(highr, highi, o_dim)
    if ll is None:
        hi = colfilter(hh, g1, mode) + colfilter(hl, g0, mode)
        lo = colfilter(lh, g1, mode)
    else:
        r, c = ll.shape[2:]
        r1, c1 = highr.shape[h_dim], highr.shape[w_dim]
        if r != r1 * 2:
            ll = ll[:, :, 1:-1]
        if c != c1 * 2:
            ll = ll[:, :, :, 1:-1]
        hi = colfilter(hh, g1, mode) + colfilter(hl, g0, mode)
        lo = colfilter(lh, g1, mode) + colfilter(ll, g0, mode)
    return rowfilter(hi, g1, mode) + rowfilter(lo, g0, mode)


def fwd_j1_rot(x, h0, h1, h2, skip_hps, o_dim, mode):
    """Rotationally-symmetric level 1 (reference transform_funcs.py:124-149):
    the diagonal band uses the h2 bandpass filter on both axes."""
    if not skip_hps:
        lo = rowfilter(x, h0, mode)
        hi = rowfilter(x, h1, mode)
        ba = rowfilter(x, h2, mode)
        lh = colfilter(lo, h1, mode)
        hl = colfilter(hi, h0, mode)
        hh = colfilter(ba, h2, mode)
        ll = colfilter(lo, h0, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = colfilter(rowfilter(x, h0, mode), h0, mode)
        highr = highi = None
    return ll, highr, highi


def fwd_j2plus_rot(x, h0a, h1a, h0b, h1b, h2a, h2b, skip_hps, o_dim,
                   mode="symmetric"):
    """(reference transform_funcs.py:252-276)"""
    if not skip_hps:
        lo = rowdfilt(x, h0b, h0a, False, mode)
        hi = rowdfilt(x, h1b, h1a, True, mode)
        ba = rowdfilt(x, h2b, h2a, True, mode)
        lh = coldfilt(lo, h1b, h1a, True, mode)
        hl = coldfilt(hi, h0b, h0a, False, mode)
        hh = coldfilt(ba, h2b, h2a, True, mode)
        ll = coldfilt(lo, h0b, h0a, False, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = rowdfilt(x, h0b, h0a, False, mode)
        ll = coldfilt(ll, h0b, h0a, False, mode)
        highr = highi = None
    return ll, highr, highi


def fwd_j2plus(x, h0a, h1a, h0b, h1b, skip_hps, o_dim, mode="symmetric"):
    """(reference transform_funcs.py:226-249; mode is always symmetric)"""
    if not skip_hps:
        lo = rowdfilt(x, h0b, h0a, False, mode)
        hi = rowdfilt(x, h1b, h1a, True, mode)
        ll = coldfilt(lo, h0b, h0a, False, mode)
        lh = coldfilt(lo, h1b, h1a, True, mode)
        hl = coldfilt(hi, h0b, h0a, False, mode)
        hh = coldfilt(hi, h1b, h1a, True, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = rowdfilt(x, h0b, h0a, False, mode)
        ll = coldfilt(ll, h0b, h0a, False, mode)
        highr = highi = None
    return ll, highr, highi


def inv_j2plus(ll, highr, highi, g0a, g1a, g0b, g1b,
               o_dim, h_dim, w_dim, mode="symmetric"):
    """(reference transform_funcs.py:279-307)"""
    if highr is None:
        return rowifilt(colifilt(ll, g0b, g0a, False, mode),
                        g0b, g0a, False, mode)
    lh, hl, hh = orientations_to_highs(highr, highi, o_dim)
    if ll is None:
        hi = colifilt(hh, g1b, g1a, True, mode) + \
            colifilt(hl, g0b, g0a, False, mode)
        lo = colifilt(lh, g1b, g1a, True, mode)
    else:
        hi = colifilt(hh, g1b, g1a, True, mode) + \
            colifilt(hl, g0b, g0a, False, mode)
        lo = colifilt(lh, g1b, g1a, True, mode) + \
            colifilt(ll, g0b, g0a, False, mode)
    return rowifilt(hi, g1b, g1a, True, mode) + \
        rowifilt(lo, g0b, g0a, False, mode)


# --- custom-VJP wrappers (filters/dims static via closure factories) ---------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fwd_j1_vjp(x, h0, h1, skip_hps, dims, mode):
    o_dim = dims[0]
    return fwd_j1(x, h0, h1, skip_hps, o_dim, mode)


def _fwd_j1_fwd(x, h0, h1, skip_hps, dims, mode):
    return fwd_j1_vjp(x, h0, h1, skip_hps, dims, mode), None


def _fwd_j1_bwd(h0, h1, skip_hps, dims, mode, _, ct):
    dl, dhr, dhi = ct
    o_dim, ri_dim, h_dim, w_dim = dims
    if skip_hps:
        dhr = dhi = None
    dx = inv_j1(dl, dhr, dhi, h0, h1, o_dim, h_dim, w_dim, mode)
    return (dx,)


fwd_j1_vjp.defvjp(_fwd_j1_fwd, _fwd_j1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def fwd_j2plus_vjp(x, h0a, h1a, h0b, h1b, skip_hps, dims, mode):
    o_dim = dims[0]
    return fwd_j2plus(x, h0a, h1a, h0b, h1b, skip_hps, o_dim, mode)


def _fwd_j2plus_fwd(x, h0a, h1a, h0b, h1b, skip_hps, dims, mode):
    return fwd_j2plus_vjp(x, h0a, h1a, h0b, h1b, skip_hps, dims, mode), None


def _fwd_j2plus_bwd(h0a, h1a, h0b, h1b, skip_hps, dims, mode, _, ct):
    dl, dhr, dhi = ct
    o_dim, ri_dim, h_dim, w_dim = dims
    if skip_hps:
        dhr = dhi = None
    # trees swap for the adjoint (reference FWD_J2PLUS.backward:398-401)
    dx = inv_j2plus(dl, dhr, dhi, h0b, h1b, h0a, h1a,
                    o_dim, h_dim, w_dim, mode)
    return (dx,)


fwd_j2plus_vjp.defvjp(_fwd_j2plus_fwd, _fwd_j2plus_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def inv_j1_vjp(ll, highs_ri, g0, g1, dims, mode):
    o_dim, ri_dim, h_dim, w_dim = dims
    if highs_ri is None:
        highr = highi = None
    else:
        highr, highi = highs_ri
    return inv_j1(ll, highr, highi, g0, g1, o_dim, h_dim, w_dim, mode)


def _inv_j1_fwd(ll, highs_ri, g0, g1, dims, mode):
    return inv_j1_vjp(ll, highs_ri, g0, g1, dims, mode), \
        (ll is None, highs_ri is None)


def _inv_j1_bwd(g0, g1, dims, mode, res, ct):
    no_ll, no_high = res
    o_dim = dims[0]
    dl, dhr, dhi = fwd_j1(ct, g0, g1, no_high, o_dim, mode)
    d_high = None if no_high else (dhr, dhi)
    return (None if no_ll else dl), d_high


inv_j1_vjp.defvjp(_inv_j1_fwd, _inv_j1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def inv_j2plus_vjp(ll, highs_ri, g0a, g1a, g0b, g1b, dims, mode):
    o_dim, ri_dim, h_dim, w_dim = dims
    if highs_ri is None:
        highr = highi = None
    else:
        highr, highi = highs_ri
    return inv_j2plus(ll, highr, highi, g0a, g1a, g0b, g1b,
                      o_dim, h_dim, w_dim, mode)


def _inv_j2plus_fwd(ll, highs_ri, g0a, g1a, g0b, g1b, dims, mode):
    return inv_j2plus_vjp(ll, highs_ri, g0a, g1a, g0b, g1b, dims, mode), \
        (ll is None, highs_ri is None)


def _inv_j2plus_bwd(g0a, g1a, g0b, g1b, dims, mode, res, ct):
    no_ll, no_high = res
    o_dim = dims[0]
    # tree swap (reference INV_J2PLUS.backward:472-474)
    dl, dhr, dhi = fwd_j2plus(ct, g0b, g1b, g0a, g1a, no_high, o_dim, mode)
    d_high = None if no_high else (dhr, dhi)
    return (None if no_ll else dl), d_high


inv_j2plus_vjp.defvjp(_inv_j2plus_fwd, _inv_j2plus_bwd)
