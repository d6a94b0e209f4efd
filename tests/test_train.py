"""Training-engine tests: replay buffer semantics, schedules, the full
jitted train step (fast 64^2 / 3-layer-D config), config CLI, and the
data-parallel path on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ficsr_tpu.train.config import TrainConfig, parse_args
from ficsr_tpu.train.replay import push_and_pop, replay_init
from ficsr_tpu.train.schedule import cosine_annealing, lambda_linear_decay
from ficsr_tpu.train.state import create_train_state
from ficsr_tpu.train.step import build_train_step

FAST = TrainConfig(batchSize=1, sizeA=32, sizeB=64, d_layers=3)
# (fast_state / fast_step / fast_cfg are session fixtures in conftest.py)


@pytest.fixture(scope="module")
def stepped(fast_state, fast_step):
    """One jitted train step executed once, reused by several tests."""
    k = jax.random.PRNGKey(7)
    ra = jax.random.normal(k, (1, 1, 64, 64), jnp.float32)
    rb = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 64, 64), jnp.float32)
    new_state, metrics = fast_step(fast_state, ra, rb, 1.3e-4)
    return fast_state, new_state, metrics


# --- replay buffer -----------------------------------------------------------


def test_replay_fills_then_swaps():
    buf = replay_init(4, (1, 2, 2))
    rng = jax.random.PRNGKey(0)
    batch = jnp.arange(3 * 4, dtype=jnp.float32).reshape(3, 1, 2, 2)
    buf, out = push_and_pop(buf, batch, rng)
    # while filling, returns exactly the input
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))
    assert int(buf.size) == 3
    buf, out = push_and_pop(buf, batch + 100, jax.random.PRNGKey(1))
    assert int(buf.size) == 4  # capped
    # every returned element is either the incoming one or a stored one
    stored_or_new = np.concatenate(
        [np.asarray(batch).reshape(3, -1),
         np.asarray(batch + 100).reshape(3, -1)])
    for row in np.asarray(out).reshape(3, -1):
        assert any(np.allclose(row, c) for c in stored_or_new)


def test_replay_swap_probability():
    """Once full, ~50% of pops should return a stored (older) element."""
    buf = replay_init(50, (1,))
    fill = jnp.zeros((50, 1), jnp.float32)
    buf, _ = push_and_pop(buf, fill, jax.random.PRNGKey(0))
    # distinct incoming values: out[i] != incoming[i] <=> swap happened
    incoming = jnp.arange(1, 401, dtype=jnp.float32).reshape(400, 1)
    _, out = push_and_pop(buf, incoming, jax.random.PRNGKey(1))
    frac_swap = float(np.mean(np.asarray(out) != np.asarray(incoming)))
    assert 0.4 < frac_swap < 0.6


# --- schedules ---------------------------------------------------------------


def test_linear_decay_schedule():
    # reference semantics: flat until decay_epoch, linear to 0 at n_epochs
    assert lambda_linear_decay(0, 50, 0, 10) == 1.0
    assert lambda_linear_decay(10, 50, 0, 10) == 1.0
    assert abs(lambda_linear_decay(30, 50, 0, 10) - 0.5) < 1e-12
    assert lambda_linear_decay(50, 50, 0, 10) == 0.0


def test_resumed_lr_schedule_continuity():
    """Regression for the r5 resume-divergence bug: the loop iterates
    ABSOLUTE epochs but also passed offset=config.epoch into
    lambda_linear_decay, double-counting a resumed start epoch.  A run
    resumed at epoch 6 of a 12-epoch decay-from-6 plan then trained its
    first epoch at lr=0 and every later epoch at NEGATIVE lr (gradient
    ascent) — both 300+300 TPU soaks diverged at the first epoch
    transition, step ~54, while uninterrupted runs of the identical
    plan were stable (benchmarks/soak_r05_resume.json pre-fix).
    A resumed process must see the exact LR an uninterrupted run sees
    at the same absolute epoch, and never a negative one."""
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.loop import lr_for_epoch

    plan = dict(n_epochs=12, decay_epoch=6, lr=1.3e-4)
    fresh = TrainConfig(scheduler=True, **plan)
    resumed = TrainConfig(scheduler=True, epoch=6, **plan)
    for e in range(6, 12):
        assert lr_for_epoch(resumed, e) == lr_for_epoch(fresh, e), e
        assert lr_for_epoch(resumed, e) > 0.0, e
    # pre-fix values for the record: epoch 6 -> 0.0, epoch 7 -> -lr/6
    assert lr_for_epoch(resumed, 7) == pytest.approx(1.3e-4 * 5 / 6)
    # the cosine paths take absolute epochs directly and must agree too
    for kw in (dict(scheduler=False),
               dict(scheduler=False, cosine_bug_compat=True)):
        f = TrainConfig(**plan, **kw)
        r = TrainConfig(epoch=6, **plan, **kw)
        for e in range(6, 12):
            assert lr_for_epoch(r, e) == lr_for_epoch(f, e), (kw, e)


def test_cosine_schedule():
    assert abs(cosine_annealing(0, 50) - 1.0) < 1e-12
    assert abs(cosine_annealing(25, 50) - 0.5) < 1e-12
    assert cosine_annealing(50, 50) < 1e-12


# --- config CLI --------------------------------------------------------------


def test_parse_args_reference_flags():
    cfg = parse_args([
        "--n_epochs", "55", "--lr", "2e-4", "--decay_epoch", "30",
        "--pretrained", "False", "--scheduler", "False",
    ])
    assert cfg.n_epochs == 55 and cfg.lr == 2e-4 and cfg.decay_epoch == 30
    # the reference's type=bool bug would make these True; we parse properly
    assert cfg.pretrained is False
    assert cfg.scheduler is False
    assert cfg.beta2 == 10.0 and cfg.batchSize == 1


# --- train step --------------------------------------------------------------


def test_step_losses_finite(stepped):
    _, _, metrics = stepped
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_step_updates_everything(stepped):
    old, new, _ = stepped
    # generator and discriminator params moved
    for tree_old, tree_new in ((old.g_params, new.g_params),
                               (old.d_params, new.d_params)):
        leaves_old = jax.tree.leaves(tree_old)
        leaves_new = jax.tree.leaves(tree_new)
        changed = sum(
            float(jnp.max(jnp.abs(a - b))) > 0
            for a, b in zip(leaves_old, leaves_new))
        assert changed > len(leaves_old) * 0.9
    # BN stats advanced
    sa_old = jax.tree.leaves(old.g_stats)
    sa_new = jax.tree.leaves(new.g_stats)
    assert any(float(jnp.max(jnp.abs(a - b))) > 0
               for a, b in zip(sa_old, sa_new))
    # replay buffers saw one fake each
    assert int(new.buf_a.size) == 1 and int(new.buf_b.size) == 1
    assert int(new.step) == 1


def test_step_deterministic(fast_state, fast_step):
    ra = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 64, 64))
    rb = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 64, 64))
    _, m1 = fast_step(fast_state, ra, rb, 1e-4)
    _, m2 = fast_step(fast_state, ra, rb, 1e-4)
    assert float(m1["loss_G"]) == float(m2["loss_G"])


def test_lr_zero_freezes_params(fast_state, fast_step):
    """AdamW with lr=0 must leave parameters untouched (validates the
    injected-hyperparam plumbing)."""
    new_state, _ = fast_step(
        fast_state,
        jax.random.normal(jax.random.PRNGKey(7), (1, 1, 64, 64)),
        jax.random.normal(jax.random.PRNGKey(8), (1, 1, 64, 64)), 0.0)
    for a, b in zip(jax.tree.leaves(fast_state.g_params),
                    jax.tree.leaves(new_state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_step_compiles():
    cfg = TrainConfig(batchSize=1, sizeA=32, sizeB=64, d_layers=3, bf16=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg, donate=False)
    ra = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64, 64))
    rb = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 64, 64))
    _, metrics = step(state, ra, rb, 1e-4)
    assert np.isfinite(float(metrics["loss_G"]))


DP_CFG = TrainConfig(batchSize=8, sizeA=32, sizeB=64, d_layers=3)


@pytest.fixture(scope="module")
def dp_stepped():
    """ONE compiled DP train step + its result, shared by the mesh
    tests (a full-step CPU compile costs ~1 min on this host)."""
    from ficsr_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch, shard_train_step)

    mesh = make_mesh(8)
    state0 = create_train_state(DP_CFG, jax.random.PRNGKey(0))
    state = replicate(mesh, state0)
    step = shard_train_step(build_train_step(DP_CFG, jit=False), mesh)
    ra = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 64, 64))
    rb = jax.random.normal(jax.random.PRNGKey(2), (8, 1, 64, 64))
    new_state, metrics = step(
        state, shard_batch(mesh, ra), shard_batch(mesh, rb), 1e-4)
    return ra, rb, new_state, metrics


def test_data_parallel_step_on_mesh(dp_stepped):
    """Full DP train step over the 8-device CPU mesh (BASELINE config 5
    shape, tiny sizes)."""
    _, _, state, metrics = dp_stepped
    assert np.isfinite(float(metrics["loss_G"]))
    assert int(state.buf_a.size) == 8


@pytest.mark.slow
def test_data_parallel_matches_single_device(dp_stepped):
    """DP over the 8-device mesh must reproduce the single-device step
    on the same global batch (validates replication, batch sharding,
    gradient psum, and global-batch BN statistics)."""
    ra, rb, new8, m8 = dp_stepped

    state1 = create_train_state(DP_CFG, jax.random.PRNGKey(0))
    step1 = build_train_step(DP_CFG, donate=False)
    new1, m1 = step1(state1, ra, rb, 1e-4)

    assert abs(float(m1["loss_G"]) - float(m8["loss_G"])) < 1e-4
    assert abs(float(m1["loss_D_A"]) - float(m8["loss_D_A"])) < 1e-4
    # Adam's first-step update ~ sign(g)*lr amplifies f32
    # reduction-order differences; 1e-3 ~ 1% of the 1e-4*... update scale
    for a, b in zip(jax.tree.leaves(new1.g_params),
                    jax.tree.leaves(new8.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)
    # BN stats are global-batch (sync-BN) in both
    for a, b in zip(jax.tree.leaves(new1.g_stats),
                    jax.tree.leaves(new8.g_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_cli_surface_matches_reference():
    """Every reference argparse flag (train.py:33-55) must exist with the
    reference's default — entrypoint-shape parity guard."""
    ref_flags = {
        "epoch": 0, "n_epochs": 50, "batchSize": 1,
        "dataroot": "./dataset/Colab_random_OCTA_augmented",
        "pretrained_root": "./pre_trained/netG_A2B_pretrained.pth",
        "pretrained": False, "B2A": False, "scheduler": True,
        "lr": 1.3e-4, "decay_epoch": 10, "sizeA": 128, "sizeB": 256,
        "input_nc": 1, "output_nc": 1, "cuda": True, "n_cpu": 2,
        "beta1": 0.25, "beta2": 10.0, "beta3": 2.0, "beta4": 0.5,
        "beta5": 0.5,
    }
    cfg = parse_args([])
    for name, default in ref_flags.items():
        assert hasattr(cfg, name), f"missing reference flag --{name}"
        got = getattr(cfg, name)
        # NB --pretrained/--scheduler/--B2A defaults match; the reference's
        # type=bool PARSING bug is deliberately not reproduced
        assert got == default, f"--{name}: {got} != reference {default}"


def test_replay_vectorized_matches_scan():
    """The vectorized push_and_pop is bit-identical to the sequential
    scan spec — filling, full-with-collisions, and mixed regimes."""
    from ficsr_tpu.train.replay import push_and_pop_scan

    for max_size, n, fills, seed in [(4, 6, 0, 0), (3, 8, 1, 1),
                                     (50, 16, 4, 2), (2, 5, 1, 3)]:
        buf_v = replay_init(max_size, (1, 2, 2))
        buf_s = replay_init(max_size, (1, 2, 2))
        rs = np.random.RandomState(seed)
        for it in range(fills + 3):
            batch = jnp.asarray(
                rs.standard_normal((n, 1, 2, 2)), jnp.float32)
            key = jax.random.PRNGKey(seed * 100 + it)
            buf_v, out_v = push_and_pop(buf_v, batch, key)
            buf_s, out_s = push_and_pop_scan(buf_s, batch, key)
            np.testing.assert_array_equal(np.asarray(out_v),
                                          np.asarray(out_s))
            np.testing.assert_array_equal(np.asarray(buf_v.data),
                                          np.asarray(buf_s.data))
            assert int(buf_v.size) == int(buf_s.size)


# --- eval-BN training compat (reference utils.py:186 + train.py:305) --------


@pytest.mark.slow
def test_eval_bn_compat_freezes_a2b_only(fast_cfg, fast_state, rng):
    """The a2b_train=False step variant (TrainConfig.eval_bn_compat):
    netG_A2B's BN running stats stop updating — and its forwards
    normalize by them — while netG_B2A and both discriminators keep
    updating theirs, replicating the reference's stuck-in-eval quirk
    from the second epoch on."""
    step = build_train_step(fast_cfg, donate=False, a2b_train=False)
    ra = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
    new, _ = step(fast_state, ra, rb, 1.3e-4)

    # a2b BN stats bit-frozen
    for a, b in zip(jax.tree.leaves(fast_state.g_stats["a2b"]),
                    jax.tree.leaves(new.g_stats["a2b"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # b2a and D stats moved
    for name, old_t, new_t in (
        ("b2a", fast_state.g_stats["b2a"], new.g_stats["b2a"]),
        ("da", fast_state.d_stats["da"], new.d_stats["da"]),
        ("db", fast_state.d_stats["db"], new.d_stats["db"]),
    ):
        moved = any(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 1e-7
            for a, b in zip(jax.tree.leaves(old_t), jax.tree.leaves(new_t)))
        assert moved, f"{name} BN stats did not update"
    # a2b params still train (gradients flow in eval-BN mode)
    a2b_moved = any(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(jax.tree.leaves(fast_state.g_params["a2b"]),
                        jax.tree.leaves(new.g_params["a2b"])))
    assert a2b_moved


def test_eval_bn_compat_epoch_gate():
    """The loop switches to the frozen variant exactly from the second
    trained epoch (train.py:305 runs eval() after every epoch)."""
    from ficsr_tpu.train.loop import a2b_train_for_epoch

    cfg = TrainConfig(eval_bn_compat=True, epoch=3)
    assert a2b_train_for_epoch(cfg, 3) is True   # first trained epoch
    assert a2b_train_for_epoch(cfg, 4) is False  # after first eval()
    assert a2b_train_for_epoch(cfg, 10) is False
    off = TrainConfig(eval_bn_compat=False)
    assert a2b_train_for_epoch(off, 5) is True
