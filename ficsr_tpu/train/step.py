"""The jitted CycleGAN train step (reference `train.py:164-269`).

One XLA program per step containing:
  * both frequency splits + SIX generator forwards (train.py:170-214)
  * the generator loss cocktail and its AdamW update (train.py:217-239)
  * replay-buffer push/pop + discriminator losses and update
    (train.py:241-269)

Stop-gradient points replicate the reference exactly:
  * forward features are detached before the BCE inverse-consistency
    loss — the detached tensor is the BCE *input* (logits) and the live
    recovered feature is the *target* (train.py:183-186,205-208,230-231)
  * D trains on buffered, detached fakes (train.py:250-251,262-263)

BatchNorm running stats are threaded through every forward in the
reference's call order (G x6, then D on fakes during the G phase, then
D x4 in the D phase) — set_requires_grad(False) in torch does not stop
BN stat updates, and neither do we.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ficsr_tpu.models.losses import bce_with_logits, gan_mse_loss, l1_loss
from ficsr_tpu.ops.freq import RADII_A, RADII_B, frequency_split
from ficsr_tpu.train.config import TrainConfig
from ficsr_tpu.train.replay import push_and_pop, push_and_pop_sharded
from ficsr_tpu.train.state import MODELS, TrainState, make_optimizer, models_for

__all__ = ["build_train_step", "build_loss_fns", "generator_forward"]


def _apply(model, params, stats, *args, train: bool = True):
    out, mut = model.apply(
        {"params": params, "batch_stats": stats}, *args, train=train,
        mutable=["batch_stats"],
    )
    return out, mut["batch_stats"]


def generator_forward(g_params, g_stats, real_a, real_b, *, train=True,
                      remat=False, dtype=jnp.float32, fused=False,
                      a2b_train=True):
    """The six-forward pass block (train.py:170-214).

    Returns everything the losses need plus updated BN stats.

    ``a2b_train=False`` replicates the reference's eval-BN training
    quirk (TrainConfig.eval_bn_compat): `utils.eval`/`eval_6m` call
    `netG_A2B.eval()` (utils.py:186,221) and train.py never calls
    `.train()` again, so from the second epoch the reference trains
    netG_A2B with BatchNorm in eval mode — normalizing by the frozen
    running stats and updating none of them.  netG_B2A and both D keep
    training-mode BN throughout.

    With ``fused=True`` (non-default, matching
    ``TrainConfig.fused_streams``; measured slower at b1 and OOM at
    b16-bf16 on v5e — benchmarks/README.md) the six sequential
    generator passes are reorganized into FOUR applications — two of
    them batched over 2 streams via
    :func:`ficsr_tpu.models.layers.use_streams` — which is
    bit-identical to the sequential schedule (per-stream BN statistics,
    running stats threaded in the reference's exact update order) but
    gives XLA twice-larger convolutions on the critical path and a
    4-deep instead of 6-deep dependency chain:

      1. a2b on [split(real_A), split(real_B)] -> fake_B, idt_B
         (s_a updates 1,2)
      2. b2a on [swap(split(real_A)), split(fake_B)] -> idt_A,
         recovered_A (s_b updates 1,2)
      3. b2a on split(real_B) -> fake_A            (s_b update 3)
      4. a2b on split(fake_A) -> recovered_B       (s_a update 3)
    """
    if fused:
        assert a2b_train, "eval_bn_compat is not supported with " \
            "fused_streams (the stream-batched BN assumes train mode)"
        return _generator_forward_fused(
            g_params, g_stats, real_a, real_b, train=train, remat=remat,
            dtype=dtype)
    a2b, b2a = MODELS["a2b"], MODELS["b2a"]
    s_a, s_b = g_stats["a2b"], g_stats["b2a"]

    def run_a2b(params, stats, lf, hf):
        f = functools.partial(_apply, a2b, train=train and a2b_train)
        if remat:
            f = jax.checkpoint(f)
        return f(params, stats, lf.astype(dtype), hf.astype(dtype))

    def run_b2a(params, stats, hf, lf):
        f = functools.partial(_apply, b2a, train=train)
        if remat:
            f = jax.checkpoint(f)
        return f(params, stats, hf.astype(dtype), lf.astype(dtype))

    # G A->B on real_A (train.py:173-176)
    lf, hf = frequency_split(real_a, *RADII_A, rfft=False)
    (lf_feat_a, hf_feat_a, fake_b), s_a = run_a2b(g_params["a2b"], s_a, lf, hf)
    # idt A (train.py:180): B2A fed real_A's split
    (_, _, idt_a), s_b = run_b2a(g_params["b2a"], s_b, hf, lf)

    # G B->A on fake_B (train.py:189-193) — gradients DO flow through
    # fake_B and the FFT split into recovered_A
    lf2, hf2 = frequency_split(fake_b.astype(jnp.float32), *RADII_B, rfft=False)
    (hf_feat_rec_a, lf_feat_rec_a, recovered_a), s_b = run_b2a(
        g_params["b2a"], s_b, hf2, lf2)

    # G B->A on real_B (train.py:197-200)
    lf3, hf3 = frequency_split(real_b, *RADII_B, rfft=False)
    (hf_feat_b, lf_feat_b, fake_a), s_b = run_b2a(g_params["b2a"], s_b, hf3, lf3)
    # idt B (train.py:203): A2B fed real_B's split
    (_, _, idt_b), s_a = run_a2b(g_params["a2b"], s_a, lf3, hf3)

    # G A->B on fake_A (train.py:211-214)
    lf4, hf4 = frequency_split(fake_a.astype(jnp.float32), *RADII_A, rfft=False)
    (lf_feat_rec_b, hf_feat_rec_b, recovered_b), s_a = run_a2b(
        g_params["a2b"], s_a, lf4, hf4)

    return dict(
        fake_a=fake_a, fake_b=fake_b,
        idt_a=idt_a, idt_b=idt_b,
        recovered_a=recovered_a, recovered_b=recovered_b,
        hf_feat_a=hf_feat_a, hf_feat_rec_a=hf_feat_rec_a,
        hf_feat_b=hf_feat_b, hf_feat_rec_b=hf_feat_rec_b,
        g_stats={"a2b": s_a, "b2a": s_b},
    )


def _generator_forward_fused(g_params, g_stats, real_a, real_b, *,
                             train=True, remat=False, dtype=jnp.float32):
    """Stream-batched schedule of the six reference passes (see
    generator_forward docstring).  Every tensor and every running-stat
    update is bit-identical to the sequential path."""
    from ficsr_tpu.models.layers import use_streams

    a2b, b2a = MODELS["a2b"], MODELS["b2a"]
    n = real_a.shape[0]

    def run(model, params, stats, x1, x2, streams):
        def f(params, stats, x1, x2):
            with use_streams(streams):
                return _apply(model, params, stats, x1.astype(dtype),
                              x2.astype(dtype), train=train)
        if remat:
            f = jax.checkpoint(f)
        return f(params, stats, x1, x2)

    # stage 1: a2b on [split(real_A) -> fake_B | split(real_B) -> idt_B]
    lf, hf = frequency_split(real_a, *RADII_A, rfft=False)        # train.py:173-175
    lf3, hf3 = frequency_split(real_b, *RADII_B, rfft=False)      # train.py:197-199
    (lf_feats, hf_feats, out_a2b), s_a = run(
        a2b, g_params["a2b"], g_stats["a2b"],
        jnp.concatenate([lf, lf3]), jnp.concatenate([hf, hf3]), 2)
    lf_feat_a, hf_feat_a = lf_feats[:n], hf_feats[:n]
    fake_b, idt_b = out_a2b[:n], out_a2b[n:]

    # stage 2: b2a on [swap(split(real_A)) -> idt_A | split(fake_B) ->
    # recovered_A] — gradients flow through fake_B's FFT split
    lf2, hf2 = frequency_split(fake_b.astype(jnp.float32), *RADII_B, rfft=False)
    (hf_feats2, lf_feats2, out_b2a), s_b = run(
        b2a, g_params["b2a"], g_stats["b2a"],
        jnp.concatenate([hf, hf2]), jnp.concatenate([lf, lf2]), 2)
    idt_a, recovered_a = out_b2a[:n], out_b2a[n:]
    hf_feat_rec_a = hf_feats2[n:]

    # stage 3: b2a on split(real_B) -> fake_A (train.py:197-200)
    (hf_feats3, _, fake_a), s_b = run(b2a, g_params["b2a"], s_b, hf3, lf3, 1)
    hf_feat_b = hf_feats3

    # stage 4: a2b on split(fake_A) -> recovered_B (train.py:211-214)
    lf4, hf4 = frequency_split(fake_a.astype(jnp.float32), *RADII_A, rfft=False)
    (_, hf_feat_rec_b, recovered_b), s_a = run(
        a2b, g_params["a2b"], s_a, lf4, hf4, 1)

    return dict(
        fake_a=fake_a, fake_b=fake_b,
        idt_a=idt_a, idt_b=idt_b,
        recovered_a=recovered_a, recovered_b=recovered_b,
        hf_feat_a=hf_feat_a, hf_feat_rec_a=hf_feat_rec_a,
        hf_feat_b=hf_feat_b, hf_feat_rec_b=hf_feat_rec_b,
        g_stats={"a2b": s_a, "b2a": s_b},
    )


def build_loss_fns(config: TrainConfig, a2b_train: bool = True):
    """(g_loss_fn, d_loss_fn) for the given config — the exact loss
    surfaces the train step differentiates (exposed for parity tests).

    a2b_train=False: the eval-BN training quirk (see generator_forward;
    TrainConfig.eval_bn_compat)."""
    models = models_for(config.d_layers)
    da, db = models["da"], models["db"]
    dtype = jnp.bfloat16 if config.bf16 else jnp.float32
    f32 = lambda t: t.astype(jnp.float32)  # noqa: E731

    def g_loss_fn(g_params, g_stats, d_params, d_stats, real_a, real_b):
        fw = generator_forward(
            g_params, g_stats, real_a, real_b,
            remat=config.remat, dtype=dtype, fused=config.fused_streams,
            a2b_train=a2b_train)

        # GAN terms (train.py:221-225); D runs in train mode, its BN
        # stats advance, its params get no gradient (we only diff g)
        pred_fake_b, s_db = _apply(
            db, d_params["db"], d_stats["db"], fw["fake_b"].astype(dtype))
        pred_fake_a, s_da = _apply(
            da, d_params["da"], d_stats["da"], fw["fake_a"].astype(dtype))
        loss_gan_a2b = gan_mse_loss(f32(pred_fake_b), True) * config.beta4
        loss_gan_b2a = gan_mse_loss(f32(pred_fake_a), True) * config.beta5

        # cycle + inverse-consistency (train.py:230-231)
        loss_cycle_aba = (
            l1_loss(f32(fw["recovered_a"]), real_a) * config.beta3
            + bce_with_logits(jax.lax.stop_gradient(f32(fw["hf_feat_a"])),
                              f32(fw["hf_feat_rec_a"]))
        )
        loss_cycle_bab = (
            l1_loss(f32(fw["recovered_b"]), real_b) * config.beta3
            + config.beta1
            * bce_with_logits(jax.lax.stop_gradient(f32(fw["hf_feat_b"])),
                              f32(fw["hf_feat_rec_b"]))
        )
        # identity (train.py:232)
        loss_idt = (l1_loss(real_a, f32(fw["idt_a"]))
                    + l1_loss(real_b, f32(fw["idt_b"]))) * config.beta2

        loss_g = (loss_gan_a2b + loss_gan_b2a + loss_cycle_aba
                  + loss_cycle_bab + loss_idt)
        aux = dict(
            fake_a=jax.lax.stop_gradient(f32(fw["fake_a"])),
            fake_b=jax.lax.stop_gradient(f32(fw["fake_b"])),
            g_stats=fw["g_stats"],
            d_stats={"da": s_da, "db": s_db},
            metrics=dict(
                loss_G=loss_g,
                loss_GAN_A2B=loss_gan_a2b, loss_GAN_B2A=loss_gan_b2a,
                loss_cycle_ABA=loss_cycle_aba, loss_cycle_BAB=loss_cycle_bab,
                loss_idt=loss_idt,
            ),
        )
        return loss_g, aux

    def d_loss_fn(d_params, d_stats, real_a, real_b, fake_a_pool, fake_b_pool):
        if config.fused_streams:
            # one 2-stream apply per discriminator: [real | buffered
            # fake], BN stats per stream in reference update order
            from ficsr_tpu.models.layers import use_streams
            n = real_a.shape[0]
            with use_streams(2):
                pred_a, s_da = _apply(
                    da, d_params["da"], d_stats["da"],
                    jnp.concatenate([real_a, fake_a_pool]).astype(dtype))
                pred_b, s_db = _apply(
                    db, d_params["db"], d_stats["db"],
                    jnp.concatenate([real_b, fake_b_pool]).astype(dtype))
            pred_real_a, pred_fake_a = pred_a[:n], pred_a[n:]
            pred_real_b, pred_fake_b = pred_b[:n], pred_b[n:]
        else:
            # D_A: real then buffered fake (train.py:247-254)
            pred_real_a, s_da = _apply(
                da, d_params["da"], d_stats["da"], real_a.astype(dtype))
            pred_fake_a, s_da = _apply(
                da, d_params["da"], s_da, fake_a_pool.astype(dtype))
            # D_B (train.py:258-266)
            pred_real_b, s_db = _apply(
                db, d_params["db"], d_stats["db"], real_b.astype(dtype))
            pred_fake_b, s_db = _apply(
                db, d_params["db"], s_db, fake_b_pool.astype(dtype))
        loss_d_a = 0.5 * (gan_mse_loss(f32(pred_real_a), True)
                          + gan_mse_loss(f32(pred_fake_a), False))
        loss_d_b = 0.5 * (gan_mse_loss(f32(pred_real_b), True)
                          + gan_mse_loss(f32(pred_fake_b), False))
        aux = dict(
            d_stats={"da": s_da, "db": s_db},
            metrics=dict(loss_D_A=loss_d_a, loss_D_B=loss_d_b),
        )
        return loss_d_a + loss_d_b, aux

    return g_loss_fn, d_loss_fn


def build_train_step(config: TrainConfig, jit: bool = True,
                     donate: bool = True, a2b_train: bool = True):
    """Returns train_step(state, real_a, real_b, lr) -> (state, metrics).

    With jit=False the raw python function is returned so a caller can
    apply its own jit with explicit shardings (parallel/mesh.py).
    donate=False keeps the input state alive (tests, interactive use).
    a2b_train=False compiles the eval-BN-compat variant of the step
    (TrainConfig.eval_bn_compat; the loop switches to it from the
    second epoch, matching reference utils.py:186 + train.py:305).
    """
    tx = make_optimizer()
    g_loss_fn, d_loss_fn = build_loss_fns(config, a2b_train=a2b_train)
    from ficsr_tpu.train.config import resolve_conv_fold
    fold = resolve_conv_fold(config)

    def train_step(state: TrainState, real_a, real_b, lr
                   ) -> Tuple[TrainState, Dict[str, Any]]:
        from ficsr_tpu.models.layers import use_fold
        with use_fold(fold):
            return _step_body(state, real_a, real_b, lr)

    def _step_body(state: TrainState, real_a, real_b, lr
                   ) -> Tuple[TrainState, Dict[str, Any]]:
        rng, k_buf_a, k_buf_b = jax.random.split(state.rng, 3)
        # lr may be a scalar (both optimizers) or a (lr_g, lr_d) pair —
        # the cosine_bug_compat schedule decays G and D differently
        # (reference train.py:109-110 wires BOTH schedulers to opt_G)
        lr_g, lr_d = lr if isinstance(lr, (tuple, list)) else (lr, lr)

        # ---- G phase ----
        (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.g_stats, state.d_params, state.d_stats,
            real_a, real_b)
        g_opt = _with_lr(state.g_opt, lr_g)
        g_updates, g_opt = tx.update(g_grads, g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- replay buffers (train.py:250,262) ----
        # replay_shards>1: per-DP-shard buffers, updates stay device-
        # local (TrainConfig.replay_shards; replay.push_and_pop_sharded)
        pp = push_and_pop_sharded if config.replay_shards > 1 \
            else push_and_pop
        buf_a, fake_a_pool = pp(state.buf_a, g_aux["fake_a"], k_buf_a)
        buf_b, fake_b_pool = pp(state.buf_b, g_aux["fake_b"], k_buf_b)

        # ---- D phase ----
        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, g_aux["d_stats"], real_a, real_b,
            fake_a_pool, fake_b_pool)
        d_opt = _with_lr(state.d_opt, lr_d)
        d_updates, d_opt = tx.update(d_grads, d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = state.replace(
            g_params=g_params, g_stats=g_aux["g_stats"],
            d_params=d_params, d_stats=d_aux["d_stats"],
            g_opt=g_opt, d_opt=d_opt,
            buf_a=buf_a, buf_b=buf_b,
            rng=rng, step=state.step + 1,
        )
        metrics = {**g_aux["metrics"], **d_aux["metrics"]}
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _with_lr(opt_state, lr):
    """Set the injected learning rate inside an inject_hyperparams state."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)
