"""Paired fine-tuning (BASELINE config 3): loss composition, training
step, paired cropping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ficsr_tpu.data.pipeline import paired_random_crop
from ficsr_tpu.train.finetune import (
    build_finetune_step,
    create_finetune_state,
    wavelet_loss,
)


@pytest.fixture(scope="module")
def ft_step():
    """One compiled finetune step shared across tests (both feed
    (4,1,64,64) so the jit cache is hit once)."""
    return build_finetune_step(jit=True, donate=False)


def test_wavelet_loss_zero_on_identical(rng):
    x = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    assert float(wavelet_loss(x, x)) < 1e-6
    y = x + 0.1
    assert float(wavelet_loss(x, y)) > 0


def test_paired_random_crop_alignment(rng):
    a = jnp.asarray(rng.randn(3, 40, 40).astype(np.float32))
    ca, cb = paired_random_crop(a, a + 5.0, 16, jax.random.PRNGKey(0))
    # same windows: cb - ca must be exactly 5 everywhere
    np.testing.assert_allclose(np.asarray(cb - ca), 5.0, atol=1e-6)
    assert ca.shape == (3, 16, 16)


def test_finetune_step_decreases_loss(rng, ft_step):
    state = create_finetune_state(jax.random.PRNGKey(0), size=64)
    step = ft_step
    lr_img = jnp.asarray(rng.randn(4, 1, 64, 64).astype(np.float32)) * 0.5
    hr_img = jnp.asarray(rng.randn(4, 1, 64, 64).astype(np.float32)) * 0.5

    _, m0 = step(state, lr_img, hr_img, 0.0)  # lr=0: loss unchanged probe
    for k, v in m0.items():
        assert np.isfinite(float(v)), k

    s = state
    losses = []
    for _ in range(4):
        s, m = step(s, lr_img, hr_img, 3e-4)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(s.step) == 4


def test_finetune_from_converted_pretrained(rng, tmp_path, ft_step):
    """Pretrained init path: torch .pth -> finetune state."""
    import torch

    from tests import ref_shims
    from ficsr_tpu.convert.from_torch import (
        convert_network_a2b, load_torch_checkpoint)

    ref_model = ref_shims.load_reference_module("model")
    torch.manual_seed(1)
    net = ref_model.NetworkA2B()
    path = str(tmp_path / "g.pth")
    torch.save(net.state_dict(), path)

    variables = convert_network_a2b(load_torch_checkpoint(path))
    state = create_finetune_state(jax.random.PRNGKey(0), 64, variables)
    lr_img = jnp.asarray(rng.randn(4, 1, 64, 64).astype(np.float32))
    hr_img = jnp.asarray(rng.randn(4, 1, 64, 64).astype(np.float32))
    _, m = ft_step(state, lr_img, hr_img, 1e-4)
    assert np.isfinite(float(m["loss"]))
