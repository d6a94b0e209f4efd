"""A/B the r4 'region-shallow' hybrid fold at large inference batches.

VERDICT r3 next #10: the full fold region loses at b>=96 (plain path's
batch tiling fills the MXU on the resnet body and the fold's kernel-zero
FLOPs turn net-negative), but the ShallowNet chains might still win
folded.  'region-shallow' folds only the ShallowNet chains
(models/generators._in_fold_region scope gating) and keeps the
ResnetGenerator plain.

Usage:  python benchmarks/fold_hybrid_ab.py  (on the TPU; ~10 min —
four tunnel compiles).  Writes fold_hybrid_ab.json and prints rows.

Measured 2026-08-19 (v5e, bf16 NHWC 256^2, honest device-accumulator
sync, 50 iters): see fold_hybrid_ab.json / benchmarks/README.md r4.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from bench import measure

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    iters = 50 if platform == "tpu" else 3
    out = {"platform": platform, "dtype": str(dtype.__name__),
           "date": "2026-08-19", "rows": {}}
    for batch in (96, 128):
        for mode in ("off", "region-shallow", "region"):
            key = f"b{batch}.{mode}"
            try:
                ips = measure(batch, iters=iters, dtype=dtype,
                              layout="NHWC", conv_fold=mode)
            except Exception as e:  # OOM etc.
                out["rows"][key] = {"error": repr(e)[:200]}
                print(key, "ERROR", repr(e)[:120], flush=True)
                continue
            out["rows"][key] = round(ips, 1)
            print(f"{key}: {ips:.1f} img/s", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fold_hybrid_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
