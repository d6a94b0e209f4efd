"""Fused Pallas Haar kernel vs the XLA fast path (interpret mode on CPU;
the same checks ran compiled on the real chip — see pallas_haar.py's
measured-verdict note)."""

import numpy as np
import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets.pallas_haar import haar_dwt2_fused, haar_idwt2_fused
from ficsr_tpu.wavelets.transform2d import _haar_even_afb2d


def test_fwd_matches_xla_path(rng):
    x = jnp.asarray(rng.randn(2, 1, 64, 64).astype(np.float32))
    ll, hs = haar_dwt2_fused(x, False)
    ll_ref, hs_ref = _haar_even_afb2d(x)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-6)


def test_renorm_fusion(rng):
    x = jnp.asarray(rng.randn(1, 2, 32, 32).astype(np.float32))
    _, hs = haar_dwt2_fused(x, True)
    _, hs_ref = _haar_even_afb2d(x)
    np.testing.assert_allclose(
        np.asarray(hs), np.asarray(hs_ref) * 0.5 + 0.5, atol=1e-6)


def test_roundtrip_and_adjoint(rng):
    x = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    ll, hs = haar_dwt2_fused(x, False)
    xr = haar_idwt2_fused(ll, hs, False)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-6)

    g = jax.grad(lambda v: jnp.sum(haar_dwt2_fused(v, True)[1] ** 2))(x)
    g_ref = jax.grad(
        lambda v: jnp.sum((_haar_even_afb2d(v)[1] * 0.5 + 0.5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_odd_row_tiles(rng):
    # 48x80: h2=24 -> tile 8; exercises multi-tile grid
    x = jnp.asarray(rng.randn(1, 1, 48, 80).astype(np.float32))
    ll, hs = haar_dwt2_fused(x, False)
    ll_ref, hs_ref = _haar_even_afb2d(x)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=1e-6)


def test_bf16_inputs(rng):
    # bf16 activations (bf16 training): outputs keep the input dtype;
    # the kernel accumulates fp32 and casts at the store (a fp32 store
    # into a bf16 ref is a Mosaic error — caught on the b16-bf16 bench)
    x = jnp.asarray(rng.randn(2, 1, 32, 32)).astype(jnp.bfloat16)
    ll, hs = haar_dwt2_fused(x, True)
    assert ll.dtype == jnp.bfloat16 and hs.dtype == jnp.bfloat16
    ll_ref, hs_ref = _haar_even_afb2d(x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(ll, np.float32),
                               np.asarray(ll_ref), atol=2e-2)
    np.testing.assert_allclose(np.asarray(hs, np.float32),
                               np.asarray(hs_ref * 0.5 + 0.5), atol=2e-2)
    xr = haar_idwt2_fused(ll, hs, True)
    assert xr.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(xr, np.float32), np.asarray(
        x, np.float32), atol=5e-2)
    # grads flow in bf16 too
    g = jax.grad(lambda v: jnp.sum(
        haar_dwt2_fused(v, False)[0].astype(jnp.float32)))(x)
    assert g.dtype == jnp.bfloat16
