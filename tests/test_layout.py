"""NHWC activation-layout equivalence (layers.set_layout).

Parameters are layout-free (stored OIHW), so the same variables must
produce the same outputs under either activation layout; the NCHW
boundary at the network-level modules means callers never see the
internal layout.  TPU perf numbers for the switch live in
benchmarks/conv_experiments.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ficsr_tpu.models import (
    FSDiscriminator,
    NetworkA2B,
    NetworkB2A,
    UnetGenerator,
)
from ficsr_tpu.models.layers import get_layout, use_layout


def _init_and_apply(model, args, train):
    variables = model.init(jax.random.PRNGKey(0), *args, train=train)
    out, mut = model.apply(variables, *args, train=train,
                           mutable=["batch_stats"])
    return variables, out, mut["batch_stats"]


@pytest.mark.parametrize("train", [False, True])
def test_generator_nhwc_matches_nchw(train):
    k = jax.random.PRNGKey(1)
    lf = jax.random.normal(k, (2, 1, 64, 64))
    hf = jax.random.normal(jax.random.fold_in(k, 1), (2, 1, 64, 64))
    model = NetworkA2B()
    with use_layout("NCHW"):
        variables, ref_out, ref_stats = _init_and_apply(
            model, (lf, hf), train)
    with use_layout("NHWC"):
        out, mut = model.apply(variables, lf, hf, train=train,
                               mutable=["batch_stats"])
    for a, b in zip(ref_out, out):
        assert a.shape == b.shape  # NCHW boundary preserved
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
    # BN running-stat updates reduce over the right axes in NHWC
    for a, b in zip(jax.tree.leaves(ref_stats),
                    jax.tree.leaves(mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_b2a_and_discriminator_nhwc_match():
    k = jax.random.PRNGKey(2)
    img = jax.random.normal(k, (2, 1, 64, 64))
    for model, args in [
        (NetworkB2A(), (img, img)),
        (FSDiscriminator(cs="sum", sum_band="ll", n_layers=3), (img,)),
        (FSDiscriminator(cs="cat", sum_band="hh", n_layers=3), (img,)),
        (UnetGenerator(num_downs=5), (img,)),
    ]:
        with use_layout("NCHW"):
            variables, ref_out, _ = _init_and_apply(model, args, True)
        with use_layout("NHWC"):
            out, _ = model.apply(variables, *args, train=True,
                                 mutable=["batch_stats"])
        for a, b in zip(jax.tree.leaves(ref_out), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-5)


def test_layout_scope_restores():
    assert get_layout() == "NCHW"
    with use_layout("NHWC"):
        assert get_layout() == "NHWC"
    assert get_layout() == "NCHW"
    with pytest.raises(ValueError):
        from ficsr_tpu.models.layers import set_layout
        set_layout("NCWH")


@pytest.mark.slow
def test_train_step_nhwc_matches_nchw():
    """One full train step agrees across layouts (fp32, tiny shapes)."""
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    cfg = TrainConfig(batchSize=1, sizeA=16, sizeB=32, d_layers=3)
    ra = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 32, 32))
    rb = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 32, 32))

    outs = {}
    for layout in ("NCHW", "NHWC"):
        with use_layout(layout):
            state = create_train_state(cfg, jax.random.PRNGKey(0))
            step = build_train_step(cfg, donate=False)
            new_state, metrics = step(state, ra, rb, 1.3e-4)
            outs[layout] = (jax.device_get(new_state.g_params),
                            jax.device_get(metrics))
    for a, b in zip(jax.tree.leaves(outs["NCHW"][0]),
                    jax.tree.leaves(outs["NHWC"][0])):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
    for k in outs["NCHW"][1]:
        np.testing.assert_allclose(outs["NCHW"][1][k], outs["NHWC"][1][k],
                                   atol=1e-3, rtol=1e-3)
