#!/usr/bin/env python3
"""Headline benchmark: 256^2 OCTA SR inference images/sec/chip.

Runs the flagship single-image SR path — FFT frequency split +
NetworkA2B forward (the exact op measured by BASELINE.json's metric,
reference call stack `utils.py:202-205`) — jitted on the default JAX
device, across a small batch sweep, and reports the best
images/sec/chip.

vs_baseline compares against the reference PyTorch implementation on
CPU (benchmarks/baseline_cpu.json, regenerate with
`python benchmarks/torch_baseline.py`); the BASELINE.md target is
>= 10x.

Prints ONE JSON line.
"""

import json
import os
import time

from ficsr_tpu import tpu_tuning

tpu_tuning.apply()  # measured-best libtpu flags; must precede jax import

import jax  # noqa: E402

# persistent compilation cache: TPU compiles through the axon tunnel
# take minutes; cached executables dispatch in <1 ms
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def _apply_layout(train: bool = False, layout: str = "auto",
                  batch: int = None):
    """Measured-fastest layout (inference: NHWC on TPU; training: NHWC
    at batch>=8 on TPU for the fold-region convs, NCHW otherwise — see
    resolve_layout), unless --layout NCHW/NHWC overrides."""
    from ficsr_tpu.models.layers import set_layout
    from ficsr_tpu.train.config import resolve_layout

    set_layout(resolve_layout(layout, train=train, batch=batch))


def measure(batch: int, iters: int = 20, dtype=jnp.float32,
            layout: str = "auto", conv_fold: str = "auto") -> float:
    """Throughput with HONEST device sync.

    On the axon runtime `jax.block_until_ready` does not wait for
    execution (verified: an 8k^3 matmul 'completed' in 0.02 ms; with a
    host transfer it takes 7.2 ms = 152 TFLOP/s).  Every iteration's
    output therefore feeds a device-side accumulator whose final value
    is pulled to the host — one transfer that forces the whole chain.
    """
    import contextlib

    from ficsr_tpu.models.layers import get_layout, use_fold
    from ficsr_tpu.ops.freq import RADII_A, frequency_split
    from ficsr_tpu.train.config import resolve_conv_fold_infer
    from ficsr_tpu.train.state import MODELS

    _apply_layout(layout=layout)
    fold = resolve_conv_fold_infer(conv_fold, layout=get_layout(),
                                   batch=batch)
    fold_ctx = use_fold(fold) if fold else contextlib.nullcontext()
    model = MODELS["a2b"]
    x = jnp.zeros((batch, 1, 256, 256), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)

    @jax.jit
    def infer(img, acc):
        lf, hf = frequency_split(img, *RADII_A)
        out, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            lf.astype(dtype), hf.astype(dtype), train=False,
            mutable=["batch_stats"])
        sr = out[2]
        # accumulator depends on the output AND feeds the next call
        return sr, acc + jnp.mean(sr.astype(jnp.float32))

    img = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    with fold_ctx:  # trace-time global; baked in at first call's trace
        _, acc_w = infer(img, acc)
        float(acc_w)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            _, acc = infer(img, acc)
        float(acc)  # host transfer forces the full chain
        dt = time.perf_counter() - t0
    return batch * iters / dt


def matmul_canary(n: int = 4096, iters: int = 20) -> float:
    """Chip-speed canary: bf16 n^3 matmul TFLOP/s with honest chained
    sync.  Reported alongside every headline number so day-to-day host/
    tunnel/chip drift is self-describing: if the canary moves with the
    headline (same ratio), the chip or runtime is slower that day; if
    only the headline moves, it is a real program change.  (Motivating
    case: 2026-08-19 infer points read 1427-1519 img/s, 2026-08-20 the
    identical program read 1364-1371 — a ~10% day-level shift that a
    flag A/B would otherwise misattribute.)"""
    a = jax.random.normal(jax.random.PRNGKey(3), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(4), (n, n), jnp.bfloat16)

    @jax.jit
    def mm(x, acc):
        # rescale by 1/sqrt(n): N(0,1) inputs make each product element
        # ~N(0, n), so an unscaled chain overflows bf16 to inf within a
        # few iterations — TPU matmul timing is data-independent, but
        # keep the accumulator finite so other backends never hit
        # inf/NaN slow paths (ADVICE r4)
        y = (x @ b) * jnp.bfloat16(1.0 / 64.0)
        return y, acc + jnp.float32(y[0, 0])

    acc = jnp.zeros((), jnp.float32)
    x, acc = mm(a, acc)
    float(acc)  # compile + sync
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, acc = mm(x, acc)
    float(acc)
    dt = time.perf_counter() - t0
    return 2.0 * n**3 * iters / dt / 1e12


def measure_train(batch: int = 1, iters: int = 20, bf16: bool = False,
                  layout: str = "auto", conv_fold: str = "auto") -> float:
    """Train steps/sec with honest chained sync (state chains step to
    step; one final host transfer forces everything)."""
    from ficsr_tpu.train.config import TrainConfig, resolve_conv_fold
    from ficsr_tpu.train.state import create_train_state
    from ficsr_tpu.train.step import build_train_step

    _apply_layout(train=True, layout=layout, batch=batch)
    cfg = TrainConfig(batchSize=batch, bf16=bf16, conv_fold=conv_fold)
    import sys
    print(f"# layout resolved, conv_fold={resolve_conv_fold(cfg)}",
          file=sys.stderr)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg)
    ra = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, 256, 256))
    rb = jax.random.normal(jax.random.PRNGKey(2), (batch, 1, 256, 256))
    state, m = step(state, ra, rb, 1.3e-4)
    float(m["loss_G"])  # compile + sync
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, ra, rb, 1.3e-4)
        acc = acc + m["loss_G"]
    float(acc)
    return iters / (time.perf_counter() - t0)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="measure train steps/sec instead of inference")
    ap.add_argument("--batch", type=int, default=1, help="train batch size")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--layout", default="auto",
                    choices=["auto", "NCHW", "NHWC"])
    ap.add_argument("--conv_fold", default="auto",
                    choices=["auto", "on", "off", "k7", "region",
                             "region-shallow"])
    ap.add_argument("--canary-only", action="store_true",
                    help="print just the chip-speed canary JSON (one "
                         "small compile) — cheap chip/tunnel drift "
                         "timestamp around long runs")
    ap.add_argument("--no-canary", action="store_true",
                    help="skip the chip-speed canary matmul (one fewer "
                         "compile; use when the canary is measured "
                         "elsewhere in the same session)")
    ap.add_argument("--no-train-field", action="store_true",
                    help="headline run only: skip the b16-bf16 train-step "
                         "measurement folded into the inference JSON "
                         "(saves its ~5 min tunnel compile; used by "
                         "xla_flags_probe's infer-kind subprocesses)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    if args.canary_only:
        import datetime
        print(json.dumps({
            "metric": "chip_canary", "value": round(matmul_canary(), 1),
            "unit": "bf16_tflops", "platform": platform,
            "time": datetime.datetime.now().isoformat(timespec="seconds")}))
        return
    canary = (round(matmul_canary(), 1)
              if platform == "tpu" and not args.no_canary else None)
    if args.train:
        tb, bf16 = args.batch, args.bf16
        sps = measure_train(batch=tb, bf16=bf16, layout=args.layout,
                            conv_fold=args.conv_fold,
                            iters=5 if platform == "cpu" else 20)
        # vs_baseline: reference torch train step on this host's CPU
        # (benchmarks/torch_train_baseline.py — the reference's native
        # batch 1), compared on an images/sec basis
        tb_path = os.path.join(os.path.dirname(__file__), "benchmarks",
                               "baseline_cpu_train.json")
        vs = None
        if os.path.isfile(tb_path):
            with open(tb_path) as f:
                ref_sps = json.load(f)["torch_cpu_train_steps_per_sec"]
            vs = (sps * tb) / ref_sps  # ref batch is 1
        print(json.dumps({
            "metric": f"octa_cyclegan_train_256px_b{tb}"
                      + ("_bf16" if bf16 else ""),
            "value": round(sps, 2),
            "unit": "steps/sec/chip",
            "ms_per_step": round(1e3 / sps, 1),
            "vs_baseline": round(vs, 1) if vs is not None else None,
            "platform": platform,
            "chip_canary_tflops": canary,
        }))
        return
    # one compile only: TPU compiles through the axon tunnel cost ~90 s
    # each and the persistent cache misses across sessions.  Measured
    # batch sweep (bf16 NHWC, r2): 32→806, 64→802, 96→1161,
    # 128→1404 img/s, 256 OOM — throughput jumps once the batch is a
    # large multiple of the 8-sublane tile, so 128 is the headline
    # batch.  bf16 activations agree with fp32 at 94.8 dB PSNR on
    # converted reference weights (far inside the ±0.1 dB parity
    # budget — benchmarks/README.md).
    if platform == "cpu":
        batches, dtype, dt_name = (4,), jnp.float32, "float32"
    else:
        batches, dtype, dt_name = (128,), jnp.bfloat16, "bfloat16"
    best = 0.0
    best_b = 1
    for b in batches:
        try:
            ips = measure(b, iters=5 if platform == "cpu" else 50,
                          dtype=dtype, layout=args.layout,
                          conv_fold=args.conv_fold)
        except Exception as e:
            # keep sweeping smaller batches on OOM, but never silently:
            # a swallowed failure here once wrote a value=0.0 row into
            # xla_flags_probe.json that looked like a real measurement
            import sys
            import traceback
            print(f"# measure(batch={b}) failed: {e!r}", file=sys.stderr)
            traceback.print_exc()
            break
        if ips > best:
            best, best_b = ips, b

    baseline_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "baseline_cpu.json")
    vs = None
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)["torch_cpu_images_per_sec"]
        vs = best / ref

    out = {
        "metric": "octa_sr_inference_256px",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "best_batch": best_b,
        "dtype": dt_name,
        "platform": platform,
        "chip_canary_tflops": canary,
    }
    # BASELINE.json's metric is "images/sec/chip (infer) + train
    # steps/sec": fold the b16-bf16 train-step measurement into the same
    # single JSON line so every round's BENCH_r*.json records both
    # headlines (VERDICT r4 #6).  TPU only — the CPU path exists for
    # smoke runs and the train compile there costs more than it informs.
    if platform == "tpu" and not args.no_train_field:
        try:
            sps = measure_train(batch=16, bf16=True, layout=args.layout,
                                conv_fold=args.conv_fold)
            out["train_metric"] = "octa_cyclegan_train_256px_b16_bf16"
            out["train_steps_per_sec"] = round(sps, 3)
            out["train_ms_per_step"] = round(1e3 / sps, 1)
            tb_path = os.path.join(os.path.dirname(__file__), "benchmarks",
                                   "baseline_cpu_train.json")
            if os.path.isfile(tb_path):
                with open(tb_path) as f:
                    ref_sps = json.load(f)["torch_cpu_train_steps_per_sec"]
                out["train_vs_baseline"] = round(sps * 16 / ref_sps, 1)
        except Exception as e:  # never lose the inference headline
            import sys
            import traceback
            print(f"# measure_train failed: {e!r}", file=sys.stderr)
            traceback.print_exc()
            out["train_error"] = repr(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
