"""Model parity: converted reference torch weights must reproduce the
reference forward outputs (the mechanism behind BASELINE config 1's
±0.1 dB pretrained-parity target — here checked to ~1e-4 absolute on
random weights, far tighter than 0.1 dB)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ficsr_tpu.convert import from_torch
from ficsr_tpu.models import (
    FSDiscriminatorA,
    FSDiscriminatorB,
    NetworkA2B,
    NetworkB2A,
    PatchGAN,
    UnetGenerator,
)

from . import ref_shims


def _randomize_bn_stats(net, rng):
    """Give running stats non-trivial values so eval-mode parity is a
    real test (fresh stats are 0/1 which BN nearly cancels)."""
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.from_numpy(rng.randn(m.num_features).astype("float32") * 0.1))
                m.running_var.copy_(
                    torch.from_numpy(0.5 + rng.rand(m.num_features).astype("float32")))


@pytest.fixture(scope="module")
def ref_model():
    return ref_shims.load_reference_module("model")


@pytest.mark.parametrize("train_mode", [False, True])
def test_network_a2b_parity(rng, ref_model, train_mode):
    torch.manual_seed(0)
    net = ref_model.NetworkA2B()
    _randomize_bn_stats(net, rng)
    net.train(train_mode)

    lf = rng.randn(1, 1, 128, 128).astype(np.float32)
    hf = rng.randn(1, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        lf_f, hf_f, out = net(torch.from_numpy(lf), torch.from_numpy(hf))

    variables = from_torch.convert_network_a2b(net.state_dict())
    model = NetworkA2B()
    (lf_j, hf_j, out_j), _ = model.apply(
        variables, jnp.asarray(lf), jnp.asarray(hf), train=train_mode,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(lf_j), lf_f.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(hf_j), hf_f.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j), out.numpy(), atol=2e-4)


@pytest.mark.parametrize("train_mode", [False, True])
def test_network_b2a_parity(rng, ref_model, train_mode):
    torch.manual_seed(1)
    net = ref_model.NetworkB2A()
    _randomize_bn_stats(net, rng)
    net.train(train_mode)

    hf = rng.randn(1, 1, 128, 128).astype(np.float32)
    lf = rng.randn(1, 1, 128, 128).astype(np.float32)
    with torch.no_grad():
        hf_f, lf_f, out = net(torch.from_numpy(hf), torch.from_numpy(lf))

    variables = from_torch.convert_network_b2a(net.state_dict())
    model = NetworkB2A()
    (hf_j, lf_j, out_j), _ = model.apply(
        variables, jnp.asarray(hf), jnp.asarray(lf), train=train_mode,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(hf_j), hf_f.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lf_j), lf_f.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j), out.numpy(), atol=2e-4)


@pytest.mark.parametrize("cls_name,builder", [
    ("FS_DiscriminatorA", FSDiscriminatorA),
    ("FS_DiscriminatorB", FSDiscriminatorB),
])
def test_fs_discriminator_parity(rng, ref_model, cls_name, builder):
    torch.manual_seed(2)
    net = getattr(ref_model, cls_name)(1)
    _randomize_bn_stats(net, rng)
    net.eval()

    # DWT halves the spatial size and PatchGAN needs >= 128 input, so
    # the discriminators only accept >= 256^2 images (as in training)
    x = rng.randn(2, 1, 256, 256).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(x))

    variables = from_torch.convert_fs_discriminator(net.state_dict())
    model = builder()
    out_j, _ = model.apply(
        variables, jnp.asarray(x), train=False, mutable=["batch_stats"])
    assert out_j.shape == (2,)
    np.testing.assert_allclose(np.asarray(out_j), out.numpy(), atol=2e-4)


def test_filter_wavelet_each_parity(rng, ref_model):
    """cs='each' (reference model.py:174-175, 230-231): per-band 5-tuple.
    Dead in the reference's forward (2-way unpack) but in the inventory;
    checked against the reference filter_wavelet itself."""
    from ficsr_tpu.models.discriminators import filter_wavelet

    x = rng.randn(2, 1, 64, 64).astype(np.float32)
    net = ref_model.FS_DiscriminatorA(1, cs="each")
    with torch.no_grad():
        golden = net.filter(torch.from_numpy(x))
    ours = filter_wavelet(jnp.asarray(x), cs="each")
    assert len(golden) == len(ours) == 5
    for g, o in zip(golden, ours):
        np.testing.assert_allclose(np.asarray(o), g.numpy(), atol=2e-5)

    # cs='each' through the discriminator forward fails in both
    # implementations (reference: 5-into-2 unpack ValueError)
    from ficsr_tpu.models.discriminators import FSDiscriminator

    model = FSDiscriminator(cs="each", n_layers=3)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64)),
                   train=False)
    with pytest.raises(ValueError):
        net(torch.from_numpy(x))


def test_patchgan_output_map_shape(rng):
    model = PatchGAN(input_nc=1)
    x = jnp.asarray(rng.randn(1, 1, 256, 256).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 1, 6, 6)  # 256 / 2^5 = 8, two VALID-ish s1 4x4 convs


def test_unet_generator_runs(rng):
    """Dead code path in the reference — we still verify it builds and
    matches the truncated-outermost output shape."""
    model = UnetGenerator(input_nc=64, output_nc=64, num_downs=7)
    x = jnp.asarray(rng.randn(1, 64, 128, 128).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    # outermost block truncates its up path: output = cat(skip, up(sub))
    # at half resolution with 2*ngf channels
    assert y.shape == (1, 128, 64, 64)


def test_generator_init_statistics():
    """weights_init_normal replication: conv ~ N(0, 0.02), BN ~ N(1, .02)."""
    model = NetworkA2B()
    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    w = variables["params"]["resnet"]["stem"]["weight"]
    assert abs(float(jnp.std(w)) - 0.02) < 0.005
    bnw = variables["params"]["resnet"]["stem_bn"]["weight"]
    assert abs(float(jnp.mean(bnw)) - 1.0) < 0.05
