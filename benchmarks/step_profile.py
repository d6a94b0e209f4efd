#!/usr/bin/env python3
"""Honest component breakdown of the CycleGAN train step.

Measures each piece of the step as its own jitted program with the
device-accumulator sync (b16-bf16 accounting: G phase 439.6 + D 8.7 +
opt/replay ~7 ≈ the 495 ms full step — benchmarks/README.md):

  freq_split x1, G fwd (a2b/b2a), G fwd+bwd, D fwd, D fwd+bwd,
  full g_loss fwd+bwd, full d_loss fwd+bwd, adamw update, replay,
  FULL step.

Usage: python benchmarks/step_profile.py [--batch 16] [--iters 20]
         [--fp32] [--remat] [--fused] [--phases-only]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


from timing import honest_ms as honest, tree_acc  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize generator forwards")
    ap.add_argument("--fused", action="store_true",
                    help="stream-batched forward schedule (non-default; "
                         "OOMs at b16-bf16 — benchmarks/README.md)")
    ap.add_argument("--phases-only", action="store_true",
                    help="skip the per-component micro rows; measure "
                         "G phase / D phase / replay / full step only")
    ap.add_argument("--resume", action="store_true",
                    help="skip rows already present in the output json "
                         "(crash-resumable slicing on the slow "
                         "remote-compile tunnel)")
    ap.add_argument("--layout", default="auto",
                    choices=["auto", "NCHW", "NHWC"],
                    help="activation layout (auto = the production "
                         "train.py resolution: NHWC at batch>=8 on TPU)")
    ap.add_argument("--conv_fold", default="auto",
                    choices=["auto", "on", "off", "k7", "region"],
                    help="persistent-fold mode (auto = production: "
                         "'region' on TPU under NHWC)")
    args = ap.parse_args()
    b, it = args.batch, args.iters
    dt = jnp.float32 if args.fp32 else jnp.bfloat16

    from ficsr_tpu.models.layers import set_layout, use_fold
    from ficsr_tpu.ops.freq import RADII_A, frequency_split
    from ficsr_tpu.train.config import (TrainConfig, resolve_conv_fold,
                                        resolve_layout)
    from ficsr_tpu.train.state import MODELS, create_train_state, \
        make_optimizer
    from ficsr_tpu.train.step import build_loss_fns

    set_layout(resolve_layout(args.layout, train=True, batch=b))
    cfg = TrainConfig(batchSize=b, bf16=not args.fp32, remat=args.remat,
                      fused_streams=args.fused, conv_fold=args.conv_fold)
    fold = resolve_conv_fold(cfg)
    print(f"# layout={args.layout} -> conv_fold={fold!r}", flush=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    g_loss_fn, d_loss_fn = build_loss_fns(cfg)
    tx = make_optimizer()

    ra = jax.random.normal(jax.random.PRNGKey(1), (b, 1, 256, 256))
    rb = jax.random.normal(jax.random.PRNGKey(2), (b, 1, 256, 256))
    lf, hf = frequency_split(ra, *RADII_A)
    lf, hf = lf.astype(dt), hf.astype(dt)

    tag = (f"b{b}_{'fp32' if args.fp32 else 'bf16'}"
           + ("_remat" if args.remat else "")
           + ("_fused" if args.fused else "")
           + (f"_fold-{fold}" if fold else ""))
    out = os.path.join(os.path.dirname(__file__), f"step_profile_{tag}.json")
    res = {}
    if os.path.isfile(out):
        with open(out) as fh:
            res.update(json.load(fh))  # preserved; refreshed rows overwrite

    def rec(name, thunk):
        # lazy: the measurement (jit compile + run) only happens when
        # the row is actually needed — --resume slices re-run cleanly
        if args.resume and name in res:
            print(f"{name:28s} {res[name]:8.2f} ms (cached)", flush=True)
            return
        ms = thunk()
        res[name] = round(ms, 2)
        print(f"{name:28s} {ms:8.2f} ms", flush=True)
        with open(out, "w") as fh:
            json.dump(res, fh, indent=1)

    micro = not args.phases_only

    @jax.jit
    def f_split(x, acc):
        a, bb = frequency_split(x, *RADII_A)
        return acc + jnp.mean(a) + jnp.mean(bb)
    micro and rec("freq_split", lambda: honest(f_split, (ra,), it))

    a2b = MODELS["a2b"]
    va = {"params": state.g_params["a2b"], "batch_stats": state.g_stats["a2b"]}

    @jax.jit
    def f_fwd(lf, hf, acc):
        with use_fold(fold):
            out, mut = a2b.apply(va, lf, hf, train=True,
                                 mutable=["batch_stats"])
        return acc + jnp.mean(out[2].astype(jnp.float32)) + tree_acc(mut)
    micro and rec("a2b fwd (train BN)", lambda: honest(f_fwd, (lf, hf), it))

    @jax.jit
    def f_fwdbwd(lf, hf, acc):
        def loss(p):
            with use_fold(fold):
                out, mut = a2b.apply(
                    {"params": p, "batch_stats": va["batch_stats"]},
                    lf, hf, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out[2].astype(jnp.float32))), mut
        (v, mut), g = jax.value_and_grad(loss, has_aux=True)(va["params"])
        return acc + v + tree_acc(g) + tree_acc(mut)
    micro and rec("a2b fwd+bwd", lambda: honest(f_fwdbwd, (lf, hf), it))

    da = MODELS["da"]
    vd = {"params": state.d_params["da"], "batch_stats": state.d_stats["da"]}
    img = ra.astype(dt)

    @jax.jit
    def d_fwd(x, acc):
        out, mut = da.apply(vd, x, train=True, mutable=["batch_stats"])
        return acc + jnp.mean(out.astype(jnp.float32)) + tree_acc(mut)
    micro and rec("D fwd", lambda: honest(d_fwd, (img,), it))

    @jax.jit
    def d_fwdbwd(x, acc):
        def loss(p):
            out, mut = da.apply({"params": p, "batch_stats": vd["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32))), mut
        (v, mut), g = jax.value_and_grad(loss, has_aux=True)(vd["params"])
        return acc + v + tree_acc(g) + tree_acc(mut)
    micro and rec("D fwd+bwd", lambda: honest(d_fwdbwd, (img,), it))

    # state pieces are ARGUMENTS, not closure constants: with the fold
    # region active, closed-over weights turn the trace-time
    # _width_fold_kernel scatter chains into giant constant expressions
    # that XLA tries to const-fold — observed >40 min compile for this
    # one probe (vs minutes with the state passed in)
    @jax.jit
    def g_phase(gp, gs, dp, ds, acc):
        with use_fold(fold):
            (l, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                gp, gs, dp, ds, ra, rb)
        # fold the BN running-stat updates too — dropping them lets XLA
        # DCE those update chains and under-report the phase.  The
        # fake_a/fake_b aux images are NOT folded: they already feed the
        # GAN losses (not DCE-able), and keeping the stop_gradient
        # copies live as outputs pushes the b16 probe past HBM.
        return acc + l + tree_acc(grads) \
            + tree_acc(aux["g_stats"]) + tree_acc(aux["metrics"])
    rec("G phase (loss fwd+bwd)",
        lambda: honest(g_phase, (state.g_params, state.g_stats,
                                 state.d_params, state.d_stats), it))

    @jax.jit
    def d_phase(dp, ds, acc):
        with use_fold(fold):
            (l, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                dp, ds, ra, rb, ra, rb)
        return acc + l + tree_acc(grads) + tree_acc(aux)
    rec("D phase (loss fwd+bwd)",
        lambda: honest(d_phase, (state.d_params, state.d_stats), it))

    zeros_g = jax.tree.map(jnp.zeros_like, state.g_params)

    @jax.jit
    def opt_g(gp, acc):
        upd, _ = tx.update(zeros_g, state.g_opt, gp)
        import optax
        newp = optax.apply_updates(gp, upd)
        return acc + tree_acc(newp)
    rec("adamw G update", lambda: honest(opt_g, (state.g_params,), it))

    from ficsr_tpu.train.replay import push_and_pop
    k = jax.random.PRNGKey(3)

    @jax.jit
    def replay(buf, x, acc):
        nb, out = push_and_pop(buf, x, k)
        return acc + jnp.sum(out) + jnp.sum(nb.data[0])
    rec("replay push_and_pop",
        lambda: honest(replay, (state.buf_a, ra), it))

    from ficsr_tpu.train.step import build_train_step
    step = build_train_step(cfg, donate=False)
    st = state

    def full(st_unused, acc):
        nonlocal st
        st, m = step(st, ra, rb, 1.3e-4)
        return acc + m["loss_G"]
    rec("FULL train step", lambda: honest(full, (None,), it))

    print("wrote", out)


if __name__ == "__main__":
    main()
