"""Stream-batched forward schedule == sequential reference schedule.

The fused path (train/step.py:_generator_forward_fused + the 2-stream
D phase) folds the reference's six generator passes
(/root/reference/train.py:170-214) into four applications and the four
discriminator passes (train.py:245-266) into two.  These tests pin the
claim that this is a pure *scheduling* change: losses, every gradient
leaf, and every BatchNorm running statistic agree with the sequential
path to float32 reduction-order tolerance.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ficsr_tpu.train.config import TrainConfig
from ficsr_tpu.train.state import create_train_state
from ficsr_tpu.train.step import build_loss_fns, generator_forward

CFG = TrainConfig(batchSize=2, sizeA=32, sizeB=64, d_layers=3,
                  fused_streams=True)


@pytest.fixture(scope="module")
def setup():
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    ra = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 64, 64))
    rb = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 64, 64))
    return state, ra, rb


def _assert_tree_close(a, b, rtol=2e-5, atol=1e-5):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_generator_forward_fused_matches_sequential(setup):
    state, ra, rb = setup
    out_seq = generator_forward(state.g_params, state.g_stats, ra, rb,
                                fused=False)
    out_fus = generator_forward(state.g_params, state.g_stats, ra, rb,
                                fused=True)
    assert set(out_seq) == set(out_fus)
    for k in out_seq:
        _assert_tree_close(out_seq[k], out_fus[k])


def test_g_loss_and_grads_match(setup):
    state, ra, rb = setup
    cfg_seq = dataclasses.replace(CFG, fused_streams=False)
    g_seq, _ = build_loss_fns(cfg_seq)
    g_fus, _ = build_loss_fns(CFG)

    def run(fn):
        (loss, aux), grads = jax.value_and_grad(fn, has_aux=True)(
            state.g_params, state.g_stats, state.d_params, state.d_stats,
            ra, rb)
        return loss, aux, grads

    l1, a1, gr1 = run(g_seq)
    l2, a2, gr2 = run(g_fus)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    _assert_tree_close(gr1, gr2)
    _assert_tree_close(a1["g_stats"], a2["g_stats"])
    _assert_tree_close(a1["d_stats"], a2["d_stats"])
    _assert_tree_close(a1["metrics"], a2["metrics"])


def test_d_loss_and_grads_match(setup):
    state, ra, rb = setup
    cfg_seq = dataclasses.replace(CFG, fused_streams=False)
    _, d_seq = build_loss_fns(cfg_seq)
    _, d_fus = build_loss_fns(CFG)
    fa = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 64, 64))
    fb = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 64, 64))

    def run(fn):
        (loss, aux), grads = jax.value_and_grad(fn, has_aux=True)(
            state.d_params, state.d_stats, ra, rb, fa, fb)
        return loss, aux, grads

    l1, a1, gr1 = run(d_seq)
    l2, a2, gr2 = run(d_fus)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    _assert_tree_close(gr1, gr2)
    _assert_tree_close(a1["d_stats"], a2["d_stats"])


def test_streams_batchnorm_unit():
    """2-stream BN apply == two sequential applies (values + running
    stats), directly at the layer level."""
    from ficsr_tpu.models.layers import BatchNorm2d, use_streams

    bn = BatchNorm2d(num_features=3)
    v = bn.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 4, 4)), train=True)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 4))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 4))

    y1, m1 = bn.apply(v, x1, train=True, mutable=["batch_stats"])
    v2 = {"params": v["params"], "batch_stats": m1["batch_stats"]}
    y2, m2 = bn.apply(v2, x2, train=True, mutable=["batch_stats"])

    with use_streams(2):
        yb, mb = bn.apply(v, jnp.concatenate([x1, x2]), train=True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yb[:2]), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yb[2:]), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)
    _assert_tree_close(m2["batch_stats"], mb["batch_stats"], rtol=1e-6)
