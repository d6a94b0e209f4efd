"""Learning-dynamics validation beyond one step (VERDICT r4 next #5).

Two slow tests prove the system *learns*, not just steps:

  * config-3 fine-tune converges: on a synthetic paired deblurring set,
    PSNR(SR, HR) beats the identity/interpolation baseline
    PSNR(LR, HR) by a clear margin — the metric regime the reference's
    eval pipeline optimizes for (`/root/reference/utils.py:218-242`).
  * short CycleGAN training moves the eval metrics the right
    direction: G_A2B output PSNR against the (held-out, paired by
    construction) clean images improves over its init value while every
    loss term stays finite and the D/G balance stays healthy.

Data is synthetic-structured (smooth random fields, reproducible), at
reduced sizes so the tests run on the CPU suite; the full-size
production program's long-run health is soaked separately on TPU
(benchmarks/soak.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ficsr_tpu.ops import metrics as M


def _smooth_images(rng: np.random.RandomState, n: int, size: int,
                   cutoff: int = 6) -> np.ndarray:
    """(n,1,size,size) float32 in [-1,1]: band-limited random fields
    with sharp thresholded edges (structure for SSIM/PSNR to care
    about)."""
    freqs = np.zeros((n, size, size), np.complex64)
    freqs[:, :cutoff, :cutoff] = (rng.randn(n, cutoff, cutoff)
                                  + 1j * rng.randn(n, cutoff, cutoff))
    fields = np.fft.ifft2(freqs).real
    fields = fields / np.abs(fields).max(axis=(1, 2), keepdims=True)
    edges = np.tanh(6.0 * fields)  # soft-thresholded plateaus + edges
    return edges[:, None].astype(np.float32)


def _blur(x: np.ndarray, sigma: float = 1.2) -> np.ndarray:
    """Depthwise Gaussian blur (the synthetic LR degradation)."""
    r = int(3 * sigma)
    k = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    y = jnp.asarray(x)
    pad = [(0, 0), (0, 0), (r, r), (r, r)]
    y = jnp.pad(y, pad, mode="reflect")
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(k)[None, None, :, None], (1, 1), "VALID")
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(k)[None, None, None, :], (1, 1), "VALID")
    return np.asarray(y)


def _mean_psnr(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean([
        M.peak_signal_noise_ratio(a[i, 0], b[i, 0], data_range=2)
        for i in range(a.shape[0])]))


@pytest.mark.slow
def test_finetune_converges_past_interpolation_baseline(rng):
    """BASELINE config 3 at reduced size: fine-tune until the SR output
    beats the un-enhanced LR input (= the bicubic/identity baseline at
    matched resolution) by >2 dB on held-out pairs."""
    from ficsr_tpu.train.finetune import (
        build_finetune_step, create_finetune_state)

    size, n_train, n_test = 64, 16, 4
    hr = _smooth_images(rng, n_train + n_test, size)
    lr = _blur(hr)
    hr_tr, hr_te = hr[:n_train], hr[n_train:]
    lr_tr, lr_te = lr[:n_train], lr[n_train:]

    baseline = _mean_psnr(lr_te, hr_te)  # "do nothing" / interp baseline

    step = build_finetune_step(jit=True, donate=False)
    state = create_finetune_state(jax.random.PRNGKey(0), size=size)
    batch = 4
    order = np.arange(n_train)
    sched = np.random.RandomState(0)
    for it in range(100):
        if it % (n_train // batch) == 0:
            sched.shuffle(order)
        sel = order[(it * batch) % n_train:(it * batch) % n_train + batch]
        state, m = step(state, jnp.asarray(lr_tr[sel]),
                        jnp.asarray(hr_tr[sel]), 1e-3)
        assert np.isfinite(float(m["loss"])), (it, m)

    # held-out eval through the same forward the step trains
    # (train-mode BN: batch stats; 4 test images = one batch)
    from ficsr_tpu.ops.freq import RADII_A, frequency_split
    from ficsr_tpu.train.state import MODELS

    lf, hf = frequency_split(jnp.asarray(lr_te), *RADII_A)
    (_, _, sr), _ = MODELS["a2b"].apply(
        {"params": state.params, "batch_stats": state.stats}, lf, hf,
        train=True, mutable=["batch_stats"])
    got = _mean_psnr(np.asarray(sr), hr_te)
    assert got > baseline + 2.0, (got, baseline)


@pytest.mark.slow
def test_cyclegan_short_training_moves_metrics_right(rng):
    """A short unpaired CycleGAN run at reduced size: every loss finite
    for all steps, identity loss drops hard (the strongest supervised
    signal in the cocktail), G_A2B's output PSNR vs the clean targets
    improves over init, and the D losses stay off the collapse/blow-up
    rails (reference capability: train.py:164-307)."""
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    size = 48
    cfg = TrainConfig(batchSize=2, sizeA=size // 2, sizeB=size,
                      d_layers=2, data_parallel=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg)

    n = 12
    clean = _smooth_images(rng, n, size)          # domain B
    degraded = _blur(clean) + 0.05 * rng.randn(*clean.shape).astype(
        np.float32)                               # domain A (paired by
    # construction; training consumes them unpaired/shuffled)

    def psnr_now(s):
        from ficsr_tpu.ops.freq import RADII_A, frequency_split
        from ficsr_tpu.train.state import MODELS
        lf, hf = frequency_split(jnp.asarray(degraded[:2]), *RADII_A)
        (_, _, sr), _ = MODELS["a2b"].apply(
            {"params": s.g_params["a2b"], "batch_stats": s.g_stats["a2b"]},
            lf, hf, train=True, mutable=["batch_stats"])
        return _mean_psnr(np.asarray(sr), clean[:2])

    psnr0 = psnr_now(state)

    perm = np.random.RandomState(1)
    idt = []
    for it in range(60):
        a = degraded[perm.permutation(n)[:2]]
        b = clean[perm.permutation(n)[:2]]
        state, m = step(state, jnp.asarray(a), jnp.asarray(b), 2e-4)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), (it, vals)
        idt.append(vals["loss_idt"])
        last = vals

    assert np.mean(idt[-10:]) < 0.5 * np.mean(idt[:10]), \
        (np.mean(idt[:10]), np.mean(idt[-10:]))
    assert psnr_now(state) > psnr0 + 1.0, (psnr0, psnr_now(state))
    # D-health: MSE-GAN equilibrium sits near 0.25; collapse => ~0,
    # runaway => >>1 sustained
    assert 0.005 < last["loss_D_A"] < 2.5, last
    assert 0.005 < last["loss_D_B"] < 2.5, last
