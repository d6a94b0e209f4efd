"""Fused Haar J=1 DWT as a Pallas TPU kernel.

The frequency discriminators run a Haar J=1 'reflect' DWT on every
forward (8x per train step counting fwd+bwd of both D's,
`model.py:140,190`).  On even sizes the transform needs no padding
(SURVEY §7), so one kernel can emit all four subbands in a single HBM
round-trip — with the discriminators' *0.5+0.5 subband renorm
(model.py:169-170) fused in for free.

Mosaic cannot lower lane-splitting reshapes or stride-2 slices
(verified: `tpu.reshape ... unsupported shape cast`,
`extract_strided_slice ... strides confined to [1,2)`), so the
even/odd pair combination is routed through the MXU instead: the Haar
butterfly along each axis is a multiplication by a constant +/-1
pair-selection matrix, generated in-register from iota.  The transform
becomes  LL = 0.5 R+ V C+,  LH = 0.5 R- V C+,  HL = 0.5 R+ V C-,
HH = 0.5 R- V C-  (R: row combiner (TH, 2TH), C: column combiner
(W, W/2)) — two MXU matmuls for the row stage, four for the columns,
on an otherwise idle MXU, keeping the kernel bandwidth-bound.

The adjoint (= exact inverse; orthogonal transform) is a second kernel
wired through jax.custom_vjp.  Non-TPU backends run the interpreter.

MEASURED VERDICT (v5e, 32x1x256x256 fp32, honest host-sync timing —
`block_until_ready` is a no-op on this runtime, see
benchmarks/README.md): this kernel runs 0.313 ms vs 0.358 ms for the
XLA-fused elementwise path in transform2d._haar_even_afb2d (~13%
faster).  On TPU, `wavelets.dwt2`'s haar even-size fast path routes
here; CPU/tests use the XLA path (interpret mode covers correctness).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["haar_dwt2_fused", "haar_idwt2_fused"]


def _dot(a, b, preferred_element_type=jnp.float32):
    # HIGHEST forces true fp32 MXU passes; default precision computes in
    # bf16 (measured 1e-2 abs error on O(1) inputs)
    return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=preferred_element_type)


def _combiners(n_out: int, n_in: int, dtype, transpose: bool = False):
    """Pair-selection matrices P±: P[k, 2k] = 1, P[k, 2k+1] = ±1.

    Returns (P+, P-) of shape (n_out, n_in) (or transposed), built from
    broadcasted_iota so no HBM input is needed.
    """
    shape = (n_in, n_out) if transpose else (n_out, n_in)
    k_axis, j_axis = (1, 0) if transpose else (0, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, shape, k_axis)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, j_axis)
    even = (j == 2 * k).astype(dtype)
    odd = (j == 2 * k + 1).astype(dtype)
    return even + odd, even - odd


def _make_fwd_kernel(renorm: bool):
    scale = 0.25 if renorm else 0.5
    shift = 0.5 if renorm else 0.0

    def kernel(x_ref, ll_ref, lh_ref, hl_ref, hh_ref):
        # fp32 operands: Mosaic rejects bf16 x bf16 -> f32 at HIGHEST
        # precision ("Bad lhs type"); the upcast is cheap VPU work and
        # the combiners are exact +/-1 in any dtype
        v = x_ref[0].astype(jnp.float32)              # (2TH, W)
        th2, w = v.shape
        rp, rm = _combiners(th2 // 2, th2, v.dtype)   # (TH, 2TH)
        cp, cm = _combiners(w // 2, w, v.dtype, transpose=True)  # (W, W/2)
        up = _dot(rp, v, preferred_element_type=jnp.float32)
        um = _dot(rm, v, preferred_element_type=jnp.float32)
        # accumulate fp32, store in the ref dtype (bf16 training inputs)
        dt = ll_ref.dtype
        ll_ref[0] = (_dot(up, cp, preferred_element_type=jnp.float32)
                     * 0.5).astype(dt)
        lh_ref[0] = (_dot(um, cp, preferred_element_type=jnp.float32)
                     * scale + shift).astype(dt)
        hl_ref[0] = (_dot(up, cm, preferred_element_type=jnp.float32)
                     * scale + shift).astype(dt)
        hh_ref[0] = (_dot(um, cm, preferred_element_type=jnp.float32)
                     * scale + shift).astype(dt)

    return kernel


def _make_inv_kernel(renorm: bool):
    inv_scale = 2.0 if renorm else 1.0
    shift = 0.5 if renorm else 0.0

    def kernel(ll_ref, lh_ref, hl_ref, hh_ref, x_ref):
        ll = ll_ref[0].astype(jnp.float32)
        lh = (lh_ref[0].astype(jnp.float32) - shift) * inv_scale
        hl = (hl_ref[0].astype(jnp.float32) - shift) * inv_scale
        hh = (hh_ref[0].astype(jnp.float32) - shift) * inv_scale
        th, w2 = ll.shape
        rp_t, rm_t = _combiners(th, th * 2, ll.dtype, transpose=True)
        cp, cm = _combiners(w2, w2 * 2, ll.dtype)     # (W/2, W)
        lo = _dot(ll, cp, preferred_element_type=jnp.float32) + \
            _dot(hl, cm, preferred_element_type=jnp.float32)
        hi = _dot(lh, cp, preferred_element_type=jnp.float32) + \
            _dot(hh, cm, preferred_element_type=jnp.float32)
        x_ref[0] = ((_dot(rp_t, lo, preferred_element_type=jnp.float32) +
                     _dot(rm_t, hi, preferred_element_type=jnp.float32))
                    * 0.5).astype(x_ref.dtype)

    return kernel


def _row_tile(h2: int) -> int:
    for t in (128, 64, 32, 16, 8, 4, 2, 1):
        if h2 % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fwd_call(x: jnp.ndarray, renorm: bool, interpret: bool):
    n, c, h, w = x.shape
    h2, w2 = h // 2, w // 2
    xf = x.reshape(n * c, h, w)
    th = _row_tile(h2)
    grid = (n * c, h2 // th)
    out_spec = pl.BlockSpec((1, th, w2), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        _make_fwd_kernel(renorm),
        grid=grid,
        in_specs=[pl.BlockSpec((1, th * 2, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((n * c, h2, w2), x.dtype)] * 4,
        interpret=interpret,
    )(xf)
    ll, lh, hl, hh = (r.reshape(n, c, h2, w2) for r in res)
    return ll, jnp.stack([lh, hl, hh], axis=2)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _inv_call(ll: jnp.ndarray, highs: jnp.ndarray, renorm: bool,
              interpret: bool):
    n, c, h2, w2 = ll.shape
    th = _row_tile(h2)
    grid = (n * c, h2 // th)
    llf = ll.reshape(n * c, h2, w2)
    lhf = highs[:, :, 0].reshape(n * c, h2, w2)
    hlf = highs[:, :, 1].reshape(n * c, h2, w2)
    hhf = highs[:, :, 2].reshape(n * c, h2, w2)
    in_spec = pl.BlockSpec((1, th, w2), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_inv_kernel(renorm),
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=pl.BlockSpec((1, th * 2, w2 * 2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * c, h2 * 2, w2 * 2), ll.dtype),
        interpret=interpret,
    )(llf, lhf, hlf, hhf)
    return out.reshape(n, c, h2 * 2, w2 * 2)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def haar_dwt2_fused(x: jnp.ndarray, renorm: bool = False):
    """Fused Haar J=1 DWT: (N,C,H,W) -> (ll, highs (N,C,3,H/2,W/2)).

    With renorm=True the three detail bands come back as b*0.5+0.5
    (the FS-discriminator recipe, model.py:169-170)."""
    return _fwd_call(x, renorm, _use_interpret())


def _fused_fwd(x, renorm):
    return haar_dwt2_fused(x, renorm), None


def _fused_bwd(renorm, _, ct):
    d_ll, d_highs = ct
    if renorm:  # adjoint of the affine renorm: scale only
        d_highs = d_highs * 0.5
    return (_inv_call(d_ll, d_highs, False, _use_interpret()),)


haar_dwt2_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def haar_idwt2_fused(ll: jnp.ndarray, highs: jnp.ndarray,
                     renorm: bool = False) -> jnp.ndarray:
    """Fused Haar J=1 inverse (undoes renorm when renorm=True)."""
    return _inv_call(ll, highs, renorm, _use_interpret())


def _ifused_fwd(ll, highs, renorm):
    return haar_idwt2_fused(ll, highs, renorm), None


def _ifused_bwd(renorm, _, ct):
    d_ll, d_highs = _fwd_call(ct, False, _use_interpret())
    if renorm:
        d_highs = d_highs * 2.0
    return d_ll, d_highs


haar_idwt2_fused.defvjp(_ifused_fwd, _ifused_bwd)
