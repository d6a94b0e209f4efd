"""ScatterNet parity vs the reference torch implementation
(reference tests/test_scatnet_fwd.py strategy) + gradient checks."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets.scatternet import ScatLayer, ScatLayerj2

from . import pywt_shim


def _ref_scat(x_np, cls_name="ScatLayer", **kw):
    pywt_shim.install()
    import importlib

    layers = importlib.import_module("pytorch_wavelets.scatternet.layers")
    layer = getattr(layers, cls_name)(**kw)
    with torch.no_grad():
        return layer(torch.from_numpy(x_np)).numpy()


@pytest.mark.parametrize("biort", ["near_sym_a", "near_sym_b_bp"])
def test_scatlayer_parity(rng, biort):
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    ref = _ref_scat(x, "ScatLayer", biort=biort)
    got = np.asarray(ScatLayer(biort=biort)(jnp.asarray(x)))
    assert got.shape == ref.shape == (2, 21, 16, 16)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_scatlayer_combine_colour(rng):
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    ref = _ref_scat(x, "ScatLayer", combine_colour=True)
    got = np.asarray(ScatLayer(combine_colour=True)(jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 9, 16, 16)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_scatlayer_odd_input(rng):
    x = rng.randn(1, 1, 31, 33).astype(np.float32)
    ref = _ref_scat(x, "ScatLayer")
    got = np.asarray(ScatLayer()(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("biort,qshift", [
    ("near_sym_a", "qshift_a"),
    ("near_sym_b_bp", "qshift_b_bp"),
])
def test_scatlayerj2_parity(rng, biort, qshift):
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    ref = _ref_scat(x, "ScatLayerj2", biort=biort, qshift=qshift)
    got = np.asarray(
        ScatLayerj2(biort=biort, qshift=qshift)(jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 98, 8, 8)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_scatlayerj2_pad_to_8(rng):
    x = rng.randn(1, 1, 30, 34).astype(np.float32)
    ref = _ref_scat(x, "ScatLayerj2")
    got = np.asarray(ScatLayerj2()(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_scatlayer_gradients_finite(rng):
    x = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    layer = ScatLayer()
    g = jax.grad(lambda v: jnp.sum(layer(v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_scatlayer_jits(rng):
    x = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    layer = ScatLayer()
    f = jax.jit(lambda v: layer(v))
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(layer(x)), atol=1e-6)
