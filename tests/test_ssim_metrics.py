"""SSIM loss parity vs the reference ssim.py (run on torch CPU) and
metric sanity checks (BASELINE config 2: SSIM numerical-parity, batch 8)."""

import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ficsr_tpu.ops import metrics
from ficsr_tpu.ops.ssim import SSIM, ssim


def _ref_ssim(img1_np, img2_np):
    from . import ref_shims
    ref_shims.require_reference()  # skip without the reference tree
    if ref_shims.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, ref_shims.REFERENCE_ROOT)
    import ssim as ref_ssim_mod  # <reference>/ssim.py (torch CPU ok)

    with torch.no_grad():
        out = ref_ssim_mod.ssim(
            torch.from_numpy(img1_np), torch.from_numpy(img2_np)
        )
    return float(out)


def test_ssim_parity_batch8(rng):
    x = rng.rand(8, 1, 64, 64).astype(np.float32) * 2 - 1
    y = np.clip(x + 0.1 * rng.randn(*x.shape).astype(np.float32), -1, 1)
    ref = _ref_ssim(x, y)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - ref) < 1e-5


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.rand(2, 1, 32, 32).astype(np.float32))
    assert float(ssim(x, x)) > 0.9999


def test_ssim_module_wrapper(rng):
    x = jnp.asarray(rng.rand(1, 1, 32, 32).astype(np.float32))
    m = SSIM()
    assert abs(float(m(x, x)) - 1.0) < 1e-4


def test_ssim_per_image(rng):
    x = jnp.asarray(rng.rand(4, 1, 32, 32).astype(np.float32))
    per = ssim(x, x, size_average=False)
    assert per.shape == (4,)


def test_psnr_mse(rng):
    a = rng.rand(32, 32) * 2 - 1
    b = a + 0.1
    mse = metrics.mean_squared_error(a, b)
    assert abs(mse - 0.01) < 1e-9
    psnr = metrics.peak_signal_noise_ratio(a, b, data_range=2)
    assert abs(psnr - 10 * np.log10(4 / 0.01)) < 1e-6
    # jax flavor matches
    assert abs(float(metrics.psnr_jax(jnp.asarray(a), jnp.asarray(b))) - psnr) < 1e-3


def test_structural_similarity_metric_properties(rng):
    a = (rng.rand(64, 64) * 2 - 1).astype(np.float64)
    assert abs(metrics.structural_similarity(a, a) - 1.0) < 1e-12
    b = np.clip(a + 0.5 * rng.randn(64, 64), -1, 1)
    s = metrics.structural_similarity(a, b)
    assert 0.0 < s < 1.0
    # more noise, lower ssim
    c = np.clip(a + 1.0 * rng.randn(64, 64), -1, 1)
    assert metrics.structural_similarity(a, c) < s


def test_nmi_properties(rng):
    a = rng.rand(64, 64)
    # self-NMI = 2 (H+H)/H
    assert abs(metrics.normalized_mutual_information(a, a) - 2.0) < 1e-9
    b = rng.rand(64, 64)
    nmi = metrics.normalized_mutual_information(a, b)
    assert 1.0 <= nmi < 1.2  # independent images are near 1
