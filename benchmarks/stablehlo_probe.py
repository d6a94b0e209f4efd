#!/usr/bin/env python3
"""Versioned probe for the StableHLO-artifact latency pathology.

r3 measured the deserialized `jax.export` SR artifact at 225-810 ms/call
on the axon TPU runtime vs 2.1 ms natively jitted (~400x) — worked
around in production by the AOT-compiled executable artifact
(serving.export_sr_compiled).  This probe minimizes the repro and
bisects WHERE the slowdown comes from, so a runtime/libtpu bump that
fixes it is detected by re-running one script (the mosaic_probes.py
pattern; VERDICT r3 next #8):

  S1 native    — tiny fn (two matmuls) natively jitted          (baseline)
  S2 sym+jit   — same fn exported with a SYMBOLIC batch dim,
                 deserialized, called inside an outer jit       (r3 recipe)
  S3 conc+jit  — exported with a CONCRETE batch (no symbolic dims)
  S4 sym eager — exported symbolic, `exported.call` with NO outer jit
  S5 SR model  — the full serving artifact (export_sr), symbolic + jit
                 (only with --full: ~2 min of tunnel compiles)

Interpretation: S2>>S1 with S3~S1 pins it on symbolic-dim call_module;
S2~S3>>S1 pins it on call_module splicing generally; S4 isolates
dispatch overhead from compiled-program slowness.

Run on the TPU: python benchmarks/stablehlo_probe.py [--full]
Output: benchmarks/stablehlo_probe.json (merged, with versions stamp).
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax import export as jexport

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import honest_ms  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "stablehlo_probe.json")


def tiny_fn(x):
    # two chained matmuls — enough structure for fusion to matter,
    # small enough to compile in seconds over the tunnel
    w1 = jnp.full((256, 512), 0.01, jnp.bfloat16)
    w2 = jnp.full((512, 256), 0.01, jnp.bfloat16)
    h = jax.nn.relu(x.astype(jnp.bfloat16) @ w1)
    return (h @ w2).astype(jnp.float32)


def _export(fn, spec, platforms=None):
    return jexport.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None)(spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--full", action="store_true",
                    help="also probe the full SR serving artifact (S5)")
    args = ap.parse_args()

    res = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)

    from mosaic_probes import versions
    res["_versions"] = versions()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.float32)

    def save():
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)

    def rec(name, ms):
        res[name] = {"ms": round(ms, 4)}
        print(f"{name:14s} {ms:9.3f} ms", flush=True)
        save()

    # S1 native
    @jax.jit
    def native(x, acc):
        return acc + jnp.sum(tiny_fn(x))
    rec("S1_native", honest_ms(native, (x,), args.iters))

    # S2 symbolic-batch export, outer jit
    b = jexport.symbolic_shape("b")[0]
    exp_sym = _export(tiny_fn, jax.ShapeDtypeStruct((b, 256), jnp.float32))
    exp_sym = jexport.deserialize(exp_sym.serialize())

    @jax.jit
    def sym_jit(x, acc):
        return acc + jnp.sum(exp_sym.call(x))
    rec("S2_sym_jit", honest_ms(sym_jit, (x,), args.iters))

    # S3 concrete-batch export, outer jit
    exp_c = _export(tiny_fn, jax.ShapeDtypeStruct((8, 256), jnp.float32))
    exp_c = jexport.deserialize(exp_c.serialize())

    @jax.jit
    def conc_jit(x, acc):
        return acc + jnp.sum(exp_c.call(x))
    rec("S3_conc_jit", honest_ms(conc_jit, (x,), args.iters))

    # S4 symbolic, eager call (timing includes per-call dispatch/trace)
    import time
    y = exp_sym.call(x)
    float(jnp.sum(y))  # warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(args.iters):
        acc = acc + jnp.sum(exp_sym.call(x))
    float(acc)
    rec("S4_sym_eager", (time.perf_counter() - t0) / args.iters * 1e3)

    for k in ("S2_sym_jit", "S3_conc_jit", "S4_sym_eager"):
        res[k]["x_native"] = round(res[k]["ms"] / res["S1_native"]["ms"], 2)
    save()

    if args.full:
        from ficsr_tpu.models.layers import use_layout
        from ficsr_tpu.serving import export_sr, load_sr, make_infer_fn
        from ficsr_tpu.train.state import MODELS

        with use_layout("NHWC"):
            x0 = jnp.zeros((1, 1, 256, 256), jnp.float32)
            variables = MODELS["a2b"].init(jax.random.PRNGKey(0), x0, x0,
                                           train=False)
            img = jax.random.normal(jax.random.PRNGKey(1), x0.shape,
                                    jnp.float32)

            @jax.jit
            def nat(img, acc):
                return acc + jnp.mean(make_infer_fn(variables,
                                                    bf16=True)(img))
            rec("S5_sr_native", honest_ms(nat, (img,), args.iters))

            sr = load_sr(export_sr(variables, bf16=True))

            @jax.jit
            def art(img, acc):
                return acc + jnp.mean(sr(img))
            rec("S5_sr_artifact", honest_ms(art, (img,), args.iters))
            res["S5_sr_artifact"]["x_native"] = round(
                res["S5_sr_artifact"]["ms"] / res["S5_sr_native"]["ms"], 2)

            # concrete-batch SR export — the candidate fix
            exp = jexport.deserialize(jexport.export(jax.jit(
                make_infer_fn(variables, bf16=True)))(
                jax.ShapeDtypeStruct((1, 1, 256, 256), jnp.float32))
                .serialize())

            @jax.jit
            def artc(img, acc):
                return acc + jnp.mean(exp.call(img))
            rec("S5_sr_concrete", honest_ms(artc, (img,), args.iters))
            res["S5_sr_concrete"]["x_native"] = round(
                res["S5_sr_concrete"]["ms"] / res["S5_sr_native"]["ms"], 2)
            save()

    print("wrote", OUT)


if __name__ == "__main__":
    main()
