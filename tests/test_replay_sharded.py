"""Sharded replay buffers (TrainConfig.replay_shards > 1).

Under data parallelism the default (replicated) replay buffer makes XLA
all-gather every step's fake images to every device.  replay_shards=n
keeps n independent histories sharded over the DP mesh so updates stay
device-local.  These tests pin:

  * push_and_pop_sharded == running push_and_pop independently per
    shard with the documented key schedule (the semantics contract);
  * a full DP train step with sharded buffers matches the same config
    run single-device (values AND buffer contents), and the buffers
    stay sharded across the step (no silent all-gather on the output);
  * shard_train_step refuses replay_sharded without a template.

Reference counterpart: utils.py:31-51 (single global buffer; the
reference has no distributed story — SURVEY §5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ficsr_tpu.train.replay import (
    push_and_pop, push_and_pop_sharded, replay_init)


def test_sharded_matches_independent_per_shard():
    shards, per, max_size = 4, 3, 5
    rng = jax.random.PRNGKey(7)
    buf = replay_init(max_size, (1, 4, 4), shards=shards)
    batch = jax.random.normal(jax.random.PRNGKey(1),
                              (shards * per, 1, 4, 4))

    # 3 pushes of 3 rows into 5 slots: fills past capacity so the
    # swap/pop branch is exercised
    for step in range(3):
        k = jax.random.fold_in(rng, step)
        buf, pool = push_and_pop_sharded(buf, batch + step, k)

    # independent per-shard replay from scratch with the documented key
    # schedule (split(rng_of_step, shards)[s]), compared to the final
    # sharded state
    ref_bufs, ref_pools = [], []
    for s in range(shards):
        b1 = replay_init(max_size, (1, 4, 4))
        for step in range(3):
            k = jax.random.fold_in(rng, step)
            keys = jax.random.split(k, shards)
            sub = (batch + step)[s * per:(s + 1) * per]
            b1, p1 = push_and_pop(b1, sub, keys[s])
        ref_bufs.append(b1)
        ref_pools.append(p1)

    for s in range(shards):
        np.testing.assert_array_equal(np.asarray(buf.data[s]),
                                      np.asarray(ref_bufs[s].data))
        assert int(buf.size[s]) == int(ref_bufs[s].size)
        np.testing.assert_array_equal(
            np.asarray(pool[s * per:(s + 1) * per]),
            np.asarray(ref_pools[s]))


def test_shards_1_shapes_are_reference_compatible():
    buf = replay_init(50, (1, 8, 8), shards=1)
    assert buf.data.shape == (50, 1, 8, 8) and buf.size.shape == ()


@pytest.mark.slow
def test_dp_step_with_sharded_replay_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ficsr_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_train_step, state_shardings)
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    n = 8
    assert jax.device_count() >= n
    cfg = TrainConfig(batchSize=n, sizeB=64, sizeA=32, d_layers=3,
                      replay_shards=n, replay_buffer_size=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    assert state.buf_a.data.shape[0] == n

    mesh = make_mesh(n)
    step_dp = shard_train_step(build_train_step(cfg, jit=False), mesh,
                               state_template=state, replay_sharded=True)
    step_1d = build_train_step(cfg, donate=False)

    # device_put may alias device-0 buffers between `state` and `sd`;
    # step_dp donates sd, so the single-device run needs its own copy
    s1 = jax.tree.map(jnp.array, state)
    sd = jax.device_put(state, state_shardings(mesh, state, True))
    ra = jax.random.normal(jax.random.PRNGKey(1), (n, 1, 64, 64))
    rb = jax.random.normal(jax.random.PRNGKey(2), (n, 1, 64, 64))
    # ONE step: both runs start from identical params, so the buffers
    # (G outputs pushed this step) must agree to reduction-order noise.
    # A second step would compare outputs of already-Adam-diverged
    # params (~0.03 differences — uninformative); the swap/pop branch
    # is pinned by the fast vmap-semantics test above.
    sd, m_dp = step_dp(sd, shard_batch(mesh, ra),
                       shard_batch(mesh, rb), 1e-4)
    s1, m_1d = step_1d(s1, ra, rb, 1e-4)

    # buffers stayed sharded over the data axis (no silent all-gather)
    want = NamedSharding(mesh, P("data"))
    assert sd.buf_a.data.sharding.is_equivalent_to(want,
                                                   sd.buf_a.data.ndim)
    # DP == single-device: losses, params, and the sharded buffers
    # psum-tree vs single-device reduction order: ~2e-5 relative noise
    np.testing.assert_allclose(float(m_dp["loss_G"]),
                               float(m_1d["loss_G"]), rtol=1e-4)
    # Adam turns f32 reduction-order noise into ~lr-scale update
    # differences (same atol as test_train.py's one-step DP test)
    la = jax.tree.leaves(sd.g_params)
    lb = jax.tree.leaves(s1.g_params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)
    # identical pre-step params -> pushed fakes agree to conv/psum
    # reduction-order noise, slot-for-slot
    np.testing.assert_allclose(np.asarray(sd.buf_a.data),
                               np.asarray(s1.buf_a.data), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sd.buf_b.size),
                                  np.asarray(s1.buf_b.size))


def test_shard_train_step_requires_template():
    from ficsr_tpu.parallel.mesh import make_mesh, shard_train_step

    with pytest.raises(AssertionError):
        shard_train_step(lambda s, a, b, lr: (s, {}), make_mesh(2),
                         replay_sharded=True)
