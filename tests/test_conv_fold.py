"""Width-fold (space-to-depth) conv formulation equivalence.

The train step may trace qualifying Conv2d calls as an algebraically
identical conv on a width-folded NHWC layout (models/layers.use_fold —
round-3 MFU work, benchmarks/conv_experiments.json).  These tests pin
that the folded formulation computes the SAME function — values and
gradients — as the plain conv, for every qualifying shape class in the
reference models (model.py:423-442 shallowNet ResBlocks, :444-480
ResnetGenerator stems), and that non-qualifying convs are untouched.

Also covers the cosine-scheduler bug-compat flag (reference
train.py:109-110) against a torch-golden simulation of the actual bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ficsr_tpu.models.layers import (
    Conv2d, get_fold, use_fold, use_layout)


def _init_and_apply(mod, x, fold):
    variables = mod.init(jax.random.PRNGKey(0), x)
    with use_fold(fold):
        return variables, mod.apply(variables, x)


@pytest.mark.parametrize("cin,cout,k,pad,hw", [
    (64, 64, 3, 1, 32),    # class A: shallow_up ResBlock convs
    (64, 128, 3, 1, 32),   # shallow_frequency widening conv
    (64, 64, 7, 0, 38),    # class C: resnet stem after ReflectionPad(3)
    (33, 64, 3, 1, 32),    # odd channel count still inside [32, 64]
])
def test_fold_matches_plain(rng, cin, cout, k, pad, hw):
    with use_layout("NHWC"):
        mod = Conv2d(cin, cout, k, stride=1, padding=pad)
        x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)),
                        jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        with use_fold(False):
            y_plain = mod.apply(variables, x)
        with use_fold(True):
            y_fold = mod.apply(variables, x)
        assert y_fold.shape == y_plain.shape
        np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_plain),
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k,pad", [(3, 1), (7, 0)])
def test_fold_gradient_equivalence(rng, k, pad):
    """d/dparams and d/dx agree between folded and plain formulations."""
    with use_layout("NHWC"):
        mod = Conv2d(64, 64, k, stride=1, padding=pad)
        x = jnp.asarray(rng.standard_normal((2, 20, 20, 64)), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(1), x)

        def loss(v, x, fold):
            with use_fold(fold):
                return jnp.mean(jnp.square(mod.apply(v, x)))

        g_plain = jax.grad(loss, argnums=(0, 1))(variables, x, False)
        g_fold = jax.grad(loss, argnums=(0, 1))(variables, x, True)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_fold)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)


def test_fold_skips_nonqualifying(rng):
    """Strided / wide / narrow / NCHW convs take the plain path."""
    cases = [
        dict(mod=Conv2d(128, 64, 3, padding=1), shape=(1, 8, 8, 128)),
        dict(mod=Conv2d(64, 64, 4, stride=2, padding=1),
             shape=(1, 8, 8, 64)),
        dict(mod=Conv2d(64, 1, 3, padding=1), shape=(1, 8, 8, 64)),
        dict(mod=Conv2d(1, 64, 3, padding=1), shape=(1, 8, 8, 1)),
    ]
    with use_layout("NHWC"):
        for case in cases:
            x = jnp.asarray(rng.standard_normal(case["shape"]), jnp.float32)
            v = case["mod"].init(jax.random.PRNGKey(0), x)
            with use_fold(False):
                y0 = case["mod"].apply(v, x)
            with use_fold(True):
                y1 = case["mod"].apply(v, x)
            np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    # NCHW layout: fold is a no-op even for qualifying shapes
    with use_layout("NCHW"), use_fold(True):
        mod = Conv2d(64, 64, 3, padding=1)
        x = jnp.asarray(rng.standard_normal((1, 64, 8, 8)), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        assert mod.apply(v, x).shape == (1, 64, 8, 8)


def test_fold_odd_width_skipped(rng):
    """Odd input width cannot reshape — must fall back, same result."""
    with use_layout("NHWC"):
        mod = Conv2d(64, 64, 3, padding=1)
        x = jnp.asarray(rng.standard_normal((1, 9, 9, 64)), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        with use_fold(True):
            y = mod.apply(v, x)
        with use_fold(False):
            y0 = mod.apply(v, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y0))


def test_fold_is_trace_scoped():
    assert not get_fold()
    with use_fold(True):
        assert get_fold()
    assert not get_fold()


@pytest.mark.slow
def test_generator_fold_equivalence(rng):
    """Full NetworkA2B forward agrees fold-on vs fold-off (NHWC)."""
    from ficsr_tpu.train.state import MODELS
    with use_layout("NHWC"):
        a2b = MODELS["a2b"]
        lf = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
        hf = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
        variables = a2b.init(jax.random.PRNGKey(0), lf, hf, train=False)
        with use_fold(False):
            out0, _ = a2b.apply(variables, lf, hf, train=False,
                                mutable=["batch_stats"])
        with use_fold(True):
            out1, _ = a2b.apply(variables, lf, hf, train=False,
                                mutable=["batch_stats"])
        for a, b in zip(out0, out1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Persistent fold region (use_fold("region")): whole 64-ch chains run
# width-folded — folded conv I/O, folded-exact BatchNorm, stride-2 exits
# consuming the fold.  Each test pins exactness vs the plain path.
# ---------------------------------------------------------------------------


from ficsr_tpu.models.layers import width_fold, width_unfold  # noqa: E402


def test_width_fold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(width_unfold(width_fold(x))),
                                  np.asarray(x))
    # phase-major layout: coarse col j = [fine 2j | fine 2j+1]
    xf = width_fold(x)
    np.testing.assert_array_equal(np.asarray(xf[0, 0, 0, :3]),
                                  np.asarray(x[0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(xf[0, 0, 0, 3:]),
                                  np.asarray(x[0, 0, 1]))


@pytest.mark.parametrize("k,pad", [(3, 1), (7, 0), (5, 2)])
def test_region_conv_stride1_folded_io(rng, k, pad):
    """Folded-input stride-1 conv == plain conv, output stays folded."""
    with use_layout("NHWC"):
        mod = Conv2d(64, 64, k, stride=1, padding=pad)
        x = jnp.asarray(rng.standard_normal((2, 22, 22, 64)), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        with use_fold(False):
            y_plain = mod.apply(v, x)
        with use_fold("region"):
            yf = mod.apply(v, width_fold(x))
        np.testing.assert_allclose(np.asarray(width_unfold(yf)),
                                   np.asarray(y_plain),
                                   atol=2e-5, rtol=1e-5)


def test_region_conv_stride2_consumes_fold(rng):
    """Stride-2 conv on folded input emits the plain (unfolded) output."""
    with use_layout("NHWC"):
        mod = Conv2d(64, 128, 3, stride=2, padding=1)
        x = jnp.asarray(rng.standard_normal((2, 24, 24, 64)), jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        with use_fold(False):
            y_plain = mod.apply(v, x)
        with use_fold("region"):
            y = mod.apply(v, width_fold(x))
        assert y.shape == y_plain.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain),
                                   atol=2e-5, rtol=1e-5)


def test_region_conv_rejects_unsupported_geometry(rng):
    with use_layout("NHWC"), use_fold("region"):
        mod = Conv2d(64, 64, 4, stride=4, padding=0)
        x = jnp.zeros((1, 8, 4, 128), jnp.float32)
        with pytest.raises(ValueError, match="folded"):
            mod.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize("train", [True, False])
def test_region_batchnorm_folded_exact(rng, train):
    """Folded BN: identical normalization AND running-stat updates."""
    from ficsr_tpu.models.layers import BatchNorm2d
    with use_layout("NHWC"):
        bn = BatchNorm2d(64)
        x = jnp.asarray(rng.standard_normal((4, 10, 12, 64)), jnp.float32)
        v = bn.init(jax.random.PRNGKey(0), x, train=True)
        # seed non-trivial running stats for the eval path
        v = {"params": v["params"],
             "batch_stats": {
                 "running_mean": jnp.asarray(
                     rng.standard_normal(64), jnp.float32),
                 "running_var": jnp.asarray(
                     1.0 + rng.random(64), jnp.float32)}}
        with use_fold(False):
            y0, m0 = bn.apply(v, x, train=train, mutable=["batch_stats"])
        with use_fold("region"):
            y1, m1 = bn.apply(v, width_fold(x), train=train,
                              mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(width_unfold(y1)),
                                   np.asarray(y0), atol=2e-5, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(m0), jax.tree.leaves(m1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


def test_region_shallownet_equivalence(rng):
    """ShallowNet (the dominant folded chain) — values + batch stats."""
    from ficsr_tpu.models.generators import ShallowNet
    with use_layout("NHWC"):
        net = ShallowNet(128, 1, up=True)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x, train=True)
        with use_fold(False):
            y0, m0 = net.apply(v, x, train=True, mutable=["batch_stats"])
        with use_fold("region"):
            y1, m1 = net.apply(v, x, train=True, mutable=["batch_stats"])
        assert y1.shape == y0.shape
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=5e-5, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(m0), jax.tree.leaves(m1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_region_generator_grad_equivalence(rng):
    """Full NetworkA2B in region mode: values AND gradients match plain
    (train mode, so folded BN statistics are differentiated through)."""
    from ficsr_tpu.train.state import MODELS
    with use_layout("NHWC"):
        a2b = MODELS["a2b"]
        lf = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
        hf = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
        variables = a2b.init(jax.random.PRNGKey(0), lf, hf, train=True)

        def loss(params, fold):
            with use_fold(fold):
                (l_f, h_f, sr), _ = a2b.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    lf, hf, train=True, mutable=["batch_stats"])
            return (jnp.mean(jnp.square(sr)) + jnp.mean(jnp.abs(l_f))
                    + jnp.mean(jnp.abs(h_f)))

        v0, g0 = jax.value_and_grad(loss)(variables["params"], False)
        v1, g1 = jax.value_and_grad(loss)(variables["params"], "region")
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_region_dp_step_equivalence(rng):
    """The production TPU composition — NHWC x conv_fold='region' x DP —
    under the 8-device mesh == single-device on the same global batch
    (VERDICT r3 weak #3).  Asserts the FULL post-step state: G and D
    params, folded-BN running stats (phase-pooling x cross-device batch
    statistics), and the replay buffers."""
    from ficsr_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch, shard_train_step)
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    ra = jnp.asarray(rng.standard_normal((8, 1, 64, 64)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((8, 1, 64, 64)), jnp.float32)
    with use_layout("NHWC"):
        cfg = TrainConfig(batchSize=8, sizeA=32, sizeB=64, d_layers=2,
                          layout="NHWC", conv_fold="region")
        state0 = create_train_state(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(8)
        step8 = shard_train_step(build_train_step(cfg, jit=False), mesh)
        new8, m8 = step8(replicate(mesh, state0),
                         shard_batch(mesh, ra), shard_batch(mesh, rb), 1e-4)
        step1 = build_train_step(cfg, donate=False)
        new1, m1 = step1(create_train_state(cfg, jax.random.PRNGKey(0)),
                         ra, rb, 1e-4)
    for k in m1:
        assert abs(float(m1[k]) - float(m8[k])) < 1e-3, k
    for name, t1, t8, tol in (
        ("g_params", new1.g_params, new8.g_params, 2e-3),
        ("d_params", new1.d_params, new8.d_params, 2e-3),
        ("g_stats", new1.g_stats, new8.g_stats, 1e-3),
        ("d_stats", new1.d_stats, new8.d_stats, 1e-3),
        ("buf_a", new1.buf_a, new8.buf_a, 1e-4),
        ("buf_b", new1.buf_b, new8.buf_b, 1e-4),
    ):
        for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=tol, err_msg=name)


@pytest.mark.slow
def test_region_train_step_equivalence(rng):
    """One full train step with conv_fold='region' matches conv_fold='off'
    (NHWC, fp32): losses, updated params, and running stats."""
    from ficsr_tpu.train.config import TrainConfig
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    ra = jnp.asarray(rng.standard_normal((2, 1, 64, 64)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((2, 1, 64, 64)), jnp.float32)
    outs = {}
    with use_layout("NHWC"):
        for fold in ("off", "region"):
            cfg = TrainConfig(batchSize=2, sizeA=32, sizeB=64, d_layers=2,
                              layout="NHWC", conv_fold=fold)
            state = create_train_state(cfg, jax.random.PRNGKey(0))
            step = build_train_step(cfg, jit=False, donate=False)
            outs[fold] = step(state, ra, rb, 1e-4)
    new0, m0 = outs["off"]
    new1, m1 = outs["region"]
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(new0.g_params),
                    jax.tree.leaves(new1.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)
    for a, b in zip(jax.tree.leaves(new0.g_stats),
                    jax.tree.leaves(new1.g_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# Cosine scheduler bug-compat (reference train.py:109-110)
# ---------------------------------------------------------------------------


def test_cosine_bug_multipliers_match_torch_golden():
    """Simulate the reference's actual bug with torch schedulers: both
    CosineAnnealingLR instances wrapping optimizer_G.  Our closed-form
    (g=cos^2 multiplier, d=1) must match torch's recursive stepping."""
    torch = pytest.importorskip("torch")
    from ficsr_tpu.train.schedule import cosine_bug_multipliers

    lr0, t_max = 2e-4, 20
    pg = torch.nn.Parameter(torch.zeros(1))
    pd = torch.nn.Parameter(torch.zeros(1))
    opt_g = torch.optim.AdamW([pg], lr=lr0)
    opt_d = torch.optim.AdamW([pd], lr=lr0)
    # the bug: BOTH schedulers wrap opt_g (reference train.py:109-110)
    sch_g = torch.optim.lr_scheduler.CosineAnnealingLR(opt_g, T_max=t_max)
    sch_d = torch.optim.lr_scheduler.CosineAnnealingLR(opt_g, T_max=t_max)
    for epoch in range(t_max):
        g_scale, d_scale = cosine_bug_multipliers(epoch, t_max)
        assert abs(opt_g.param_groups[0]["lr"] - lr0 * g_scale) < 1e-12, epoch
        assert abs(opt_d.param_groups[0]["lr"] - lr0 * d_scale) < 1e-12, epoch
        sch_g.step()
        sch_d.step()


def test_train_step_accepts_lr_pair(rng, fast_state, fast_step):
    """The jitted step takes (lr_g, lr_d) and applies them separately."""
    ra = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
    rb = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.float32)
    new, _ = fast_step(fast_state, ra, rb, (2e-4, 1.3e-4))
    g_lr = float(new.g_opt.hyperparams["learning_rate"])
    d_lr = float(new.d_opt.hyperparams["learning_rate"])
    assert abs(g_lr - 2e-4) < 1e-9
    assert abs(d_lr - 1.3e-4) < 1e-9


# ---------------------------------------------------------------------------
# Inference fold plumbing (r3c): conv_fold is a static arg of the jitted
# _sr_infer (cache key + trace-scoped use_fold) and resolves through
# resolve_conv_fold_infer for bench.py / infer.py / serving / eval.
# ---------------------------------------------------------------------------


def test_resolve_conv_fold_infer_contract():
    from ficsr_tpu.train.config import resolve_conv_fold_infer

    # explicit modes under NHWC
    assert resolve_conv_fold_infer("off", layout="NHWC") is False
    assert resolve_conv_fold_infer("region", layout="NHWC") == "region"
    assert resolve_conv_fold_infer("region-shallow",
                                   layout="NHWC") == "region-shallow"
    assert resolve_conv_fold_infer("on", layout="NHWC") is True
    # fold formulations require the channels-last layout
    assert resolve_conv_fold_infer("off", layout="NCHW") is False
    assert resolve_conv_fold_infer("auto", layout="NCHW") is False
    with pytest.raises(ValueError):
        resolve_conv_fold_infer("region", layout="NCHW")
    # 'auto' never raises and yields a valid mode on any backend
    assert resolve_conv_fold_infer("auto", layout="NHWC") in (
        False, "region")
    # 'auto' is batch-aware: region only inside the measured TPU
    # window (benchmarks/README.md r3c); off at b1, large batch, and
    # unknown (symbolic) batch on every backend
    for b in (None, 1, 128):
        assert resolve_conv_fold_infer("auto", layout="NHWC",
                                       batch=b) is False
    mid = resolve_conv_fold_infer("auto", layout="NHWC", batch=16)
    import jax
    assert mid == ("region" if jax.default_backend() == "tpu" else False)


def test_sr_infer_fold_region_equivalence(rng):
    """The jitted eval-path SR inference (_sr_infer via make_sr_infer)
    computes identical outputs with conv_fold='region' vs 'off'."""
    from ficsr_tpu.train import evaluate
    from ficsr_tpu.train.state import MODELS

    with use_layout("NHWC"):
        a2b = MODELS["a2b"]
        x0 = jnp.zeros((1, 1, 32, 32), jnp.float32)
        variables = a2b.init(jax.random.PRNGKey(0), x0, x0, train=False)
        x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
        y_off = evaluate.make_sr_infer(variables, conv_fold="off")(x)
        y_reg = evaluate.make_sr_infer(variables, conv_fold="region")(x)
        np.testing.assert_allclose(np.asarray(y_reg), np.asarray(y_off),
                                   atol=5e-5, rtol=1e-4)


def test_region_shallow_hybrid_scope(rng):
    """'region-shallow' (r4 hybrid): ShallowNet chains fold, the
    ResnetGenerator stem chain stays plain."""
    from ficsr_tpu.models.generators import _in_fold_region
    from ficsr_tpu.models.layers import use_fold

    x = jnp.zeros((2, 8, 8, 64), jnp.float32)
    with use_layout("NHWC"):
        with use_fold("region-shallow"):
            assert _in_fold_region(x, scope="shallow")
            assert not _in_fold_region(x, scope="resnet")
        with use_fold("region"):
            assert _in_fold_region(x, scope="shallow")
            assert _in_fold_region(x, scope="resnet")


def test_sr_infer_fold_region_shallow_equivalence(rng):
    """The r4 hybrid mode computes outputs identical to 'off' through
    the full NetworkA2B inference path."""
    from ficsr_tpu.train import evaluate
    from ficsr_tpu.train.state import MODELS

    with use_layout("NHWC"):
        a2b = MODELS["a2b"]
        x0 = jnp.zeros((1, 1, 32, 32), jnp.float32)
        variables = a2b.init(jax.random.PRNGKey(0), x0, x0, train=False)
        x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
        y_off = evaluate.make_sr_infer(variables, conv_fold="off")(x)
        y_hyb = evaluate.make_sr_infer(variables,
                                       conv_fold="region-shallow")(x)
        np.testing.assert_allclose(np.asarray(y_hyb), np.asarray(y_off),
                                   atol=5e-5, rtol=1e-4)


def test_serving_infer_fn_fold_region_equivalence(rng):
    """serving.make_infer_fn traces the region fold into the artifact
    computation and stays value-identical to the plain path."""
    from ficsr_tpu.serving import make_infer_fn
    from ficsr_tpu.train.state import MODELS

    with use_layout("NHWC"):
        a2b = MODELS["a2b"]
        x0 = jnp.zeros((1, 1, 32, 32), jnp.float32)
        variables = a2b.init(jax.random.PRNGKey(0), x0, x0, train=False)
        x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
        y_off = jax.jit(make_infer_fn(variables, conv_fold="off"))(x)
        y_reg = jax.jit(make_infer_fn(variables, conv_fold="region"))(x)
        np.testing.assert_allclose(np.asarray(y_reg), np.asarray(y_off),
                                   atol=5e-5, rtol=1e-4)
