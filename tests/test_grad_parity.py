"""Full generator-loss VALUE and GRADIENT parity vs the reference
training step (train.py:170-239), batch 1 at 256^2 with identical
converted weights.

This pins the entire training semantics in one shot: the six forward
passes, the frequency-split radii, every loss weight, and — most
fragile — the stop-gradient points (the detached features are the BCE
*logits*, the live recovered features the *targets*).

Marked slow (~6-10 min on this 1-core host: torch backward through six
generator passes + a jitted JAX grad at 256^2).  Run with
`pytest -m slow` or `pytest tests/test_grad_parity.py`.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ficsr_tpu.convert import from_torch
from ficsr_tpu.train.config import TrainConfig
from ficsr_tpu.train.step import build_loss_fns

from . import ref_shims

pytestmark = pytest.mark.slow


def _mask(h, w, radius, high):
    ci, cj = h // 2, w // 2
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    d2 = (i - ci) ** 2 + (j - cj) ** 2
    m = np.exp(-0.5 * d2 / radius ** 2)
    return torch.from_numpy((1 - m if high else m).astype(np.float32))


def _split_torch(x, hf_r, lf_r):
    """Reference train-time split (train.py:173-175) on CPU torch."""
    img = x[0, 0]
    f = torch.fft.fftshift(torch.fft.fft2(img))
    hf = torch.abs(torch.fft.ifft2(torch.fft.ifftshift(
        f * _mask(*img.shape, hf_r, True))))
    lf = -torch.abs(torch.fft.ifft2(torch.fft.ifftshift(
        f * _mask(*img.shape, lf_r, False))))
    hf = (hf[None, None] + x) / 2.0
    return lf[None, None], hf


def test_g_loss_value_and_grad_parity(rng):
    ref_model = ref_shims.load_reference_module("model")
    torch.manual_seed(0)
    netG_A2B = ref_model.NetworkA2B()
    netG_B2A = ref_model.NetworkB2A()
    netD_A = ref_model.FS_DiscriminatorA(1)
    netD_B = ref_model.FS_DiscriminatorB(1)
    for n in (netG_A2B, netG_B2A, netD_A, netD_B):
        n.train()

    real_A = torch.from_numpy(rng.randn(1, 1, 256, 256).astype(np.float32))
    real_B = torch.from_numpy(rng.randn(1, 1, 256, 256).astype(np.float32))

    # ---- reference G phase (train.py:170-239) ----
    beta1, beta2, beta3, beta4, beta5 = 0.25, 10.0, 2.0, 0.5, 0.5
    mse = torch.nn.MSELoss()
    l1 = torch.nn.L1Loss()
    bce = torch.nn.BCEWithLogitsLoss()
    target_real = torch.ones(1)

    lf, hf = _split_torch(real_A, 10, 8)
    lf_fA, hf_fA, fake_B = netG_A2B(lf, hf)
    _, _, idt_A = netG_B2A(hf, lf)
    hf_fA = hf_fA.detach()

    lf2, hf2 = _split_torch(fake_B, 5, 14)
    hf_frA, lf_frA, recovered_A = netG_B2A(hf2, lf2)

    lf3, hf3 = _split_torch(real_B, 5, 14)
    hf_fB, lf_fB, fake_A = netG_B2A(hf3, lf3)
    _, _, idt_B = netG_A2B(lf3, hf3)
    hf_fB = hf_fB.detach()

    lf4, hf4 = _split_torch(fake_A, 10, 8)
    lf_frB, hf_frB, recovered_B = netG_A2B(lf4, hf4)

    pred_fake_B = netD_B(fake_B)
    loss_GAN_A2B = mse(pred_fake_B, target_real) * beta4
    pred_fake_A = netD_A(fake_A)
    loss_GAN_B2A = mse(pred_fake_A, target_real) * beta5
    loss_cycle_ABA = l1(recovered_A, real_A) * beta3 + bce(hf_fA, hf_frA)
    loss_cycle_BAB = l1(recovered_B, real_B) * beta3 + \
        beta1 * bce(hf_fB, hf_frB)
    loss_idt = l1(real_A, idt_A) * beta2 + l1(real_B, idt_B) * beta2
    loss_G_ref = loss_GAN_A2B + loss_GAN_B2A + loss_cycle_ABA + \
        loss_cycle_BAB + loss_idt
    loss_G_ref.backward()

    probes_ref = {
        ("a2b", "resnet", "stem", "weight"):
            netG_A2B.resnet.model[1].weight.grad.numpy(),
        ("a2b", "shallow_frequency", "conv0", "weight"):
            netG_A2B.shallow_frequency[0].weight.grad.numpy(),
        ("a2b", "shallow_up", "head", "weight"):
            netG_A2B.shallow_up.model[7].weight.grad.numpy(),
        ("b2a", "B2A_input", "weight"):
            netG_B2A.B2A_input[0].weight.grad.numpy(),
        ("b2a", "shallow_frequency", "conv2", "weight"):
            netG_B2A.shallow_frequency[5].weight.grad.numpy(),
    }

    # ---- our side: identical weights, same batch ----
    g_params = {
        "a2b": from_torch.convert_network_a2b(netG_A2B.state_dict()),
        "b2a": from_torch.convert_network_b2a(netG_B2A.state_dict()),
    }
    d_params = {
        "da": from_torch.convert_fs_discriminator(netD_A.state_dict()),
        "db": from_torch.convert_fs_discriminator(netD_B.state_dict()),
    }
    g_p = {k: v["params"] for k, v in g_params.items()}
    g_s = {k: v["batch_stats"] for k, v in g_params.items()}
    d_p = {k: v["params"] for k, v in d_params.items()}
    d_s = {k: v["batch_stats"] for k, v in d_params.items()}

    cfg = TrainConfig()  # reference betas, d_layers=5, fp32
    g_loss_fn, _ = build_loss_fns(cfg)

    @jax.jit
    def loss_and_grad(gp):
        (loss, _), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            gp, g_s, d_p, d_s,
            jnp.asarray(real_A.numpy()), jnp.asarray(real_B.numpy()))
        return loss, grads

    loss_G, grads = loss_and_grad(g_p)

    assert abs(float(loss_G) - float(loss_G_ref)) < 2e-3 * (
        1 + abs(float(loss_G_ref))), \
        f"loss mismatch: jax {float(loss_G)} vs torch {float(loss_G_ref)}"

    for path, ref_g in probes_ref.items():
        node = grads[path[0]]
        for k in path[1:]:
            node = node[k]
        got = np.asarray(node)
        denom = np.maximum(np.abs(ref_g).max(), 1e-6)
        rel_err = np.abs(got - ref_g).max() / denom
        assert rel_err < 5e-3, f"grad mismatch at {path}: rel {rel_err:.2e}"


def test_d_loss_value_and_grad_parity(rng):
    """Discriminator-phase parity (train.py:241-269): loss values and
    D-parameter gradients vs the reference, identical converted weights."""
    ref_model = ref_shims.load_reference_module("model")
    torch.manual_seed(5)
    netD_A = ref_model.FS_DiscriminatorA(1)
    netD_B = ref_model.FS_DiscriminatorB(1)
    netD_A.train()
    netD_B.train()

    real_A = torch.from_numpy(rng.randn(1, 1, 256, 256).astype(np.float32))
    real_B = torch.from_numpy(rng.randn(1, 1, 256, 256).astype(np.float32))
    fake_A = torch.from_numpy(rng.randn(1, 1, 256, 256).astype(np.float32))
    fake_B = torch.from_numpy(rng.randn(1, 1, 256, 256).astype(np.float32))

    mse = torch.nn.MSELoss()
    ones, zeros = torch.ones(1), torch.zeros(1)
    loss_D_A = 0.5 * (mse(netD_A(real_A), ones) +
                      mse(netD_A(fake_A), zeros))
    loss_D_B = 0.5 * (mse(netD_B(real_B), ones) +
                      mse(netD_B(fake_B), zeros))
    (loss_D_A + loss_D_B).backward()
    probes_ref = {
        ("da", "net", "conv0", "weight"):
            netD_A.net.model[0].weight.grad.numpy(),
        ("da", "net_dwt", "head", "weight"):
            netD_A.net_dwt.model[17].weight.grad.numpy(),
        ("db", "net", "conv2", "weight"):
            netD_B.net.model[5].weight.grad.numpy(),
        ("db", "net_dwt", "conv0", "weight"):
            netD_B.net_dwt.model[0].weight.grad.numpy(),
    }

    d_vars = {
        "da": from_torch.convert_fs_discriminator(netD_A.state_dict()),
        "db": from_torch.convert_fs_discriminator(netD_B.state_dict()),
    }
    d_p = {k: v["params"] for k, v in d_vars.items()}
    d_s = {k: v["batch_stats"] for k, v in d_vars.items()}

    _, d_loss_fn = build_loss_fns(TrainConfig())

    @jax.jit
    def loss_and_grad(dp):
        (loss, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            dp, d_s,
            jnp.asarray(real_A.numpy()), jnp.asarray(real_B.numpy()),
            jnp.asarray(fake_A.numpy()), jnp.asarray(fake_B.numpy()))
        return loss, aux["metrics"], grads

    loss, metrics, grads = loss_and_grad(d_p)
    assert abs(float(metrics["loss_D_A"]) - float(loss_D_A)) < 1e-4
    assert abs(float(metrics["loss_D_B"]) - float(loss_D_B)) < 1e-4
    for path, ref_g in probes_ref.items():
        node = grads[path[0]]
        for k in path[1:]:
            node = node[k]
        got = np.asarray(node)
        denom = np.maximum(np.abs(ref_g).max(), 1e-8)
        rel = np.abs(got - ref_g).max() / denom
        assert rel < 5e-3, f"grad mismatch at {path}: rel {rel:.2e}"
