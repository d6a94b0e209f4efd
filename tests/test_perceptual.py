"""VGG19 perceptual loss: architecture parity vs torchvision's layer
plan (weights random — no pretrained fetch in this image) + converter."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from ficsr_tpu.models.perceptual import (
    PerceptualLoss,
    VGG19Features,
    load_torchvision_features,
)
from ficsr_tpu.utils.image import tensor2image


def _torch_vgg_prefix():
    """Reference contentFunc architecture (model.py:62-72): torchvision
    vgg19().features[0..14] — rebuilt inline since torchvision is absent."""
    layers = []
    plan = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
            (128, 256), (256, 256), (256, 256)]
    for p in plan:
        if p == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(p[0], p[1], 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
    seq = torch.nn.Sequential(*layers[:15])  # through conv3_3, no relu
    return seq


def test_vgg_features_parity_with_converted_weights(rng):
    torch.manual_seed(0)
    net = _torch_vgg_prefix()
    net.eval()
    # build a torchvision-features-style state_dict (keys 'idx.weight')
    sd = {}
    for i, m in enumerate(net):
        if isinstance(m, torch.nn.Conv2d):
            sd[f"{i}.weight"] = m.weight
            sd[f"{i}.bias"] = m.bias

    variables = load_torchvision_features(sd)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(VGG19Features().apply(variables, jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 256, 8, 8)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_perceptual_loss_grayscale_repeat(rng):
    loss = PerceptualLoss(rng=jax.random.PRNGKey(0))
    fake = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    real = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    v = loss.get_loss(fake, real)
    assert np.isfinite(float(v))
    # gradient flows through fake only (real is stop_gradient'ed)
    g = jax.grad(lambda f: loss.get_loss(f, real))(fake)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_tensor2image(rng):
    t = rng.rand(2, 1, 8, 8).astype(np.float32) * 2 - 1
    img = tensor2image(t)
    assert img.shape == (3, 8, 8) and img.dtype == np.uint8
