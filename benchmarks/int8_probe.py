#!/usr/bin/env python3
"""Probe: does XLA route int8 contractions to the v5e MXU int8 path?

The v5e datasheet peak is ~394 TOPS int8 vs ~197 TFLOP/s bf16.  If
int8 convs actually hit that path, a weight+activation-quantized
serving pipeline could roughly double the inference headline.  This
probe measures (honest device-accumulator sync, see timing.py):

  1. bf16 4096^3 matmul            (calibration, ~152 TF/s measured r1)
  2. int8 4096^3 dot_general       (preferred_element_type=int32)
  3. bf16 vs int8 3x3 64ch @256^2 NHWC conv  (class A, the hot class)
  4. bf16 vs int8 3x3 256ch @32^2 NHWC conv  (class B)

Output: benchmarks/int8_probe.json rows {name: {ms, tops}}.

Usage: python benchmarks/int8_probe.py [--iters 30]
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
from jax import lax  # noqa: E402

from timing import honest_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    it = args.iters

    res = {}
    out = os.path.join(os.path.dirname(__file__), "int8_probe.json")

    def rec(name, ms, ops):
        res[name] = {"ms": round(ms, 3), "tops": round(ops / ms / 1e9, 1)}
        print(f"{name:36s} {ms:8.3f} ms  {res[name]['tops']:7.1f} T/s",
              flush=True)
        with open(out, "w") as fh:
            json.dump(res, fh, indent=1)

    # --- 1. bf16 matmul calibration ---------------------------------
    n = 4096
    k0 = jax.random.PRNGKey(0)
    a16 = jax.random.normal(k0, (n, n), jnp.bfloat16)
    b16 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    @jax.jit
    def mm_bf16(a, b, acc):
        c = a @ b
        return acc + jnp.sum(c.astype(jnp.float32)[::997, ::997])

    rec("matmul 4096^3 bf16", honest_ms(mm_bf16, (a16, b16), it), 2 * n**3)

    # --- 2. int8 matmul ----------------------------------------------
    a8 = jax.random.randint(k0, (n, n), -127, 127, jnp.int8)
    b8 = jax.random.randint(jax.random.PRNGKey(1), (n, n), -127, 127,
                            jnp.int8)

    @jax.jit
    def mm_int8(a, b, acc):
        c = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return acc + jnp.sum(c[::997, ::997])

    rec("matmul 4096^3 int8", honest_ms(mm_int8, (a8, b8), it), 2 * n**3)

    # --- 3/4. convs ---------------------------------------------------
    def conv_nhwc(x, w, pet=None):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    for tag, (bsz, hw, c) in (("A.3x3_64_256", (16, 256, 64)),
                              ("B.3x3_256_32", (16, 32, 256))):
        x16 = jax.random.normal(k0, (bsz, hw, hw, c), jnp.bfloat16)
        w16 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, c, c),
                                jnp.bfloat16)
        flops = 2 * bsz * hw * hw * c * c * 9

        @jax.jit
        def cv16(x, w, acc):
            y = conv_nhwc(x, w)
            return acc + jnp.sum(y.astype(jnp.float32)[:, ::61, ::61, ::31])

        rec(f"{tag} conv bf16", honest_ms(cv16, (x16, w16), it), flops)

        x8 = jax.random.randint(k0, (bsz, hw, hw, c), -127, 127, jnp.int8)
        w8 = jax.random.randint(jax.random.PRNGKey(2), (3, 3, c, c),
                                -127, 127, jnp.int8)

        @jax.jit
        def cv8(x, w, acc):
            y = conv_nhwc(x, w, pet=jnp.int32)
            return acc + jnp.sum(y[:, ::61, ::61, ::31])

        try:
            rec(f"{tag} conv int8", honest_ms(cv8, (x8, w8), it), flops)
        except Exception as e:  # pragma: no cover - probe
            print(f"{tag} conv int8 FAILED: {type(e).__name__}: {e}",
                  flush=True)
            res[f"{tag} conv int8"] = {"error": str(e)[:200]}
            with open(out, "w") as fh:
                json.dump(res, fh, indent=1)

    # --- 5. int8 conv with bf16 dequant epilogue (realistic serving) --
    bsz, hw, c = 16, 256, 64
    x8 = jax.random.randint(k0, (bsz, hw, hw, c), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.PRNGKey(2), (3, 3, c, c),
                            -127, 127, jnp.int8)
    scale = jax.random.uniform(jax.random.PRNGKey(3), (c,), jnp.float32)
    flops = 2 * bsz * hw * hw * c * c * 9

    @jax.jit
    def cv8_deq(x, w, s, acc):
        y = conv_nhwc(x, w, pet=jnp.int32)
        z = y.astype(jnp.float32) * s
        return acc + jnp.sum(z[:, ::61, ::61, ::31])

    try:
        rec("A.3x3_64_256 conv int8+dequant",
            honest_ms(cv8_deq, (x8, w8, scale), it), flops)
    except Exception as e:  # pragma: no cover - probe
        print(f"int8+dequant FAILED: {type(e).__name__}: {e}", flush=True)

    print("wrote", out)


if __name__ == "__main__":
    main()
