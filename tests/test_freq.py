"""Frequency-split op parity vs the reference torch implementation.

The reference `utils.high_pass/low_pass` (utils.py:93-117) are
re-implemented here in torch for test purposes only (the originals
call .cuda(); we reproduce their math on CPU) and compared against the
batched JAX versions.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ficsr_tpu.ops import freq


def _ref_mask_highpass(h, w, radius):
    # reference guais_high_pass (utils.py:82-91), literal loop semantics
    ci, cj = h // 2, w // 2
    m = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            d = (i - ci) ** 2 + (j - cj) ** 2
            m[i, j] = 1 - np.exp(-0.5 * d / radius ** 2)
    return m.astype(np.float32)


def _ref_high_pass(img_np, radius):
    # reference high_pass (utils.py:93-103) on CPU torch
    t = torch.from_numpy(img_np)
    f = torch.fft.fft2(t)
    fs = torch.fft.fftshift(f)
    mask = torch.from_numpy(_ref_mask_highpass(*img_np.shape, radius))
    out = torch.fft.ifft2(torch.fft.ifftshift(fs * mask))
    return torch.abs(out).numpy()


def _ref_low_pass(img_np, radius):
    t = torch.from_numpy(img_np)
    f = torch.fft.fft2(t)
    fs = torch.fft.fftshift(f)
    ci, cj = img_np.shape[0] // 2, img_np.shape[1] // 2
    m = 1.0 - _ref_mask_highpass(*img_np.shape, radius)
    out = torch.fft.ifft2(torch.fft.ifftshift(fs * torch.from_numpy(m)))
    return -torch.abs(out).numpy()


@pytest.mark.parametrize("radius", [5, 8, 10, 14])
@pytest.mark.parametrize("size", [(256, 256), (128, 128), (127, 129)])
def test_high_pass_parity(rng, radius, size):
    x = rng.randn(*size).astype(np.float32)
    ref = _ref_high_pass(x, radius)
    got = np.asarray(freq.high_pass(jnp.asarray(x)[None, None], radius))[0, 0]
    np.testing.assert_allclose(got, ref, atol=3e-5)


@pytest.mark.parametrize("radius", [8, 14])
def test_low_pass_parity_and_negation(rng, radius):
    x = rng.randn(256, 256).astype(np.float32)
    ref = _ref_low_pass(x, radius)
    got = np.asarray(freq.low_pass(jnp.asarray(x)[None, None], radius))[0, 0]
    np.testing.assert_allclose(got, ref, atol=3e-5)
    assert got.max() <= 0.0  # utils.py:117 negation


def test_frequency_split_matches_train_recipe(rng):
    """train.py:173-175: hf=(high_pass(x,10)+x)/2, lf=low_pass(x,8)."""
    x = rng.randn(2, 1, 64, 64).astype(np.float32)
    xj = jnp.asarray(x)
    lf, hf = freq.frequency_split(xj, *freq.RADII_A)
    hf_expected = (freq.high_pass(xj, 10.0) + xj) * 0.5
    lf_expected = freq.low_pass(xj, 8.0)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_expected), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lf_expected), atol=1e-5)


def test_batched_equals_per_sample(rng):
    x = rng.randn(3, 1, 32, 32).astype(np.float32)
    batched = np.asarray(freq.high_pass(jnp.asarray(x), 10.0))
    for i in range(3):
        single = np.asarray(freq.high_pass(jnp.asarray(x[i]), 10.0))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_bandreject(rng):
    x = rng.randn(64, 64).astype(np.float32)
    out = np.asarray(freq.bandreject_pass(jnp.asarray(x)[None, None], 30, 5))
    assert out.shape == (1, 1, 64, 64)
    assert np.isfinite(out).all()


def test_edge_ops(rng):
    x = jnp.asarray(rng.randn(1, 1, 16, 16).astype(np.float32))
    lap = freq.laplacian_edge(x)
    assert lap.shape == (1, 1, 16, 16)
    sob = freq.sobel_edge(x)
    assert sob.shape == (1, 1, 14, 14)


def test_strict_batch1_compat(rng):
    """strict_batch1 reproduces the reference's sample-0 broadcast
    (train.py:173, utils.py:94); identical to batched mode at N=1."""
    x = rng.randn(3, 1, 32, 32).astype(np.float32)
    xj = jnp.asarray(x)
    lf_s, hf_s = freq.frequency_split(xj, 10.0, 8.0, strict_batch1=True)
    lf0, hf0 = freq.frequency_split(xj[:1], 10.0, 8.0)
    # every sample's filtered part comes from sample 0
    np.testing.assert_allclose(np.asarray(lf_s[1]), np.asarray(lf0[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf_s[2]),
                               (np.asarray(hf0[0]) * 2 - x[0] + x[2]) / 2,
                               atol=1e-6)
    # batch 1: strict == batched
    lf_a, hf_a = freq.frequency_split(xj[:1], 10.0, 8.0, strict_batch1=True)
    np.testing.assert_allclose(np.asarray(lf_a), np.asarray(lf0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(hf_a), np.asarray(hf0), atol=1e-7)
