#!/usr/bin/env python3
"""Serving latency & throughput rows (VERDICT r2 weak #6 / next #8).

Measures, with the honest device-accumulator sync (timing.py):

  * batch-1 single-image SR latency — fp32/NCHW (the r1 number) and
    bf16/NHWC (the serving config)
  * the SAME computation through a deserialized `jax.export` StableHLO
    artifact (ficsr_tpu/serving.py) at batch 1 — what a serving process
    that loads the portable artifact actually pays
  * optional batch sweep points to refine the throughput headline
    (--sweep 160 192: between the known 128 peak and the 256 OOM)

Usage: python benchmarks/serving_latency.py [--iters 50] [--sweep ...]
Writes benchmarks/serving_latency.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from timing import honest_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--sweep", type=int, nargs="*", default=[])
    args = ap.parse_args()

    from ficsr_tpu.models.layers import use_layout
    from ficsr_tpu.ops.freq import RADII_A, frequency_split
    from ficsr_tpu.serving import export_sr, load_sr
    from ficsr_tpu.train.state import MODELS

    model = MODELS["a2b"]
    res = {}
    out_path = os.path.join(os.path.dirname(__file__),
                            "serving_latency.json")

    def rec(name, ms, batch):
        res[name] = {"ms": round(ms, 3),
                     "img_per_s": round(batch * 1e3 / ms, 1)}
        print(f"{name:36s} {ms:8.3f} ms  {batch * 1e3 / ms:8.1f} img/s",
              flush=True)
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)

    def run(layout, dtype, batch, tag):
        with use_layout(layout):
            x0 = jnp.zeros((batch, 1, 256, 256), jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), x0, x0,
                                   train=False)

            @jax.jit
            def infer(img, acc):
                lf, hf = frequency_split(img, *RADII_A)
                out, _ = model.apply(variables, lf.astype(dtype),
                                     hf.astype(dtype), train=False,
                                     mutable=["batch_stats"])
                return acc + jnp.mean(out[2].astype(jnp.float32))

            img = jax.random.normal(jax.random.PRNGKey(1), x0.shape,
                                    jnp.float32)
            rec(tag, honest_ms(infer, (img,), args.iters), batch)
            return variables

    run("NCHW", jnp.float32, 1, "b1 fp32 NCHW")
    variables = run("NHWC", jnp.bfloat16, 1, "b1 bf16 NHWC (serving)")

    # exported-artifact latency: serialize with NHWC+bf16 (the serving
    # config) and drive the deserialized callable
    with use_layout("NHWC"):
        blob = export_sr(variables, bf16=True)
        res["artifact_bytes"] = len(blob)
        sr = load_sr(blob)

        @jax.jit
        def art(img, acc):
            return acc + jnp.mean(sr(img))

        img1 = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 256, 256),
                                 jnp.float32)
        rec("b1 StableHLO artifact", honest_ms(art, (img1,), args.iters), 1)

    for b in args.sweep:
        try:
            run("NHWC", jnp.bfloat16, b, f"b{b} bf16 NHWC")
        except Exception as e:  # OOM etc.
            res[f"b{b} bf16 NHWC"] = {"error": str(e)[:200]}
            print(f"b{b}: {e}", flush=True)
            with open(out_path, "w") as fh:
                json.dump(res, fh, indent=1)

    print("wrote", out_path)


if __name__ == "__main__":
    main()
