#!/usr/bin/env python3
"""Probe: do XLA/libtpu tuning flags move the two headline programs?

Tries a small set of long-standing TPU compiler knobs on top of the
production configuration and measures both headline programs via
subprocess `bench.py` runs (flags must be set before backend init, so
each flag-set gets its own process; each run recompiles — the flags
change the executable):

  * inference, batch 128 bf16 NHWC (the img/s headline)
  * train step, batch 16 bf16 fold-region (the steps/sec headline)

Flag sets:
  baseline        (empty — the numbers every other benchmark reports)
  vmem32m/64m/128m --xla_tpu_scoped_vmem_limit_kib={32768,65536,131072}
                  (bigger scoped-VMEM scratch budget -> larger fusions)
  lhs             --xla_tpu_enable_latency_hiding_scheduler=true
                  (mostly a collectives knob; included to pin that it
                  is neutral single-chip)

A flag unknown to this XLA/libtpu build makes the subprocess die at
startup; that is recorded as {"error": ...} rather than crashing the
probe, so the probe doubles as a flag-availability check across
libtpu bumps (like mosaic_probes.py / int8_probe.py).

Output: benchmarks/xla_flags_probe.json (each entry carries a
`_conditions` provenance stamp: date, kinds run, host-load note)
Usage:  python benchmarks/xla_flags_probe.py
            [--skip-train | --train-only] [--only NAME[,NAME...]]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks", "xla_flags_probe.json")

FLAG_SETS = {
    "baseline": "",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # "LIBTPU:" prefix -> LIBTPU_INIT_ARGS instead of XLA_FLAGS (the
    # PJRT-plugin channel for libtpu knobs; XLA_FLAGS is parsed by the
    # *client* process, which on axon knows no TPU flags — measured
    # 2026-08-19, every --xla_tpu_* set above dies in
    # parse_flags_from_env.cc client-side)
    "libtpu_vmem32m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=32768",
    "libtpu_vmem48m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=49152",
    "libtpu_vmem56m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=57344",
    "libtpu_vmem64m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=65536",
    "libtpu_vmem72m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=73728",
    "libtpu_vmem80m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=81920",
    "libtpu_vmem96m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=98304",
    "libtpu_vmem128m": "LIBTPU:--xla_tpu_scoped_vmem_limit_kib=131072",
    "libtpu_lhs": "LIBTPU:--xla_tpu_enable_latency_hiding_scheduler=true",
}


def run_bench(extra_flags: str, train: bool) -> dict:
    env = dict(os.environ)
    # bench.py self-applies the adopted flags (ficsr_tpu/tpu_tuning.py);
    # disable that so every set here — baseline included — measures
    # exactly the flags it names
    env["FICSR_NO_TPU_TUNING"] = "1"
    if extra_flags.startswith("LIBTPU:"):
        env["LIBTPU_INIT_ARGS"] = (env.get("LIBTPU_INIT_ARGS", "") + " "
                                   + extra_flags[len("LIBTPU:"):]).strip()
    elif extra_flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " "
                            + extra_flags).strip()
    # flags change the executable; no cache-poisoning risk: the axon
    # plugin folds a per-session id into the persistent-cache key, so
    # every subprocess compiles fresh under its own flags (r1 finding,
    # benchmarks/README.md)
    cmd = [sys.executable, os.path.join(ROOT, "bench.py")]
    if train:
        cmd += ["--train", "--batch", "16", "--bf16"]
    else:
        # the headline bench now folds a train-step measurement into the
        # default run; each probe subprocess recompiles, so skip it here
        # (the train kind measures it separately)
        cmd += ["--no-train-field"]
    try:
        # 45 min: tunnel compiles measured 10-15+ min on slow days
        # (2026-08-20), and an infer run is canary + infer = 2 compiles
        p = subprocess.run(cmd, env=env, cwd=ROOT, capture_output=True,
                           text=True, timeout=2700)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not line:
        return {"error": (p.stderr.strip().splitlines() or ["no output"])
                [-1][:300]}
    r = json.loads(line[-1])
    if not r.get("value"):
        # a value of 0.0 means every batch errored inside bench.py — a
        # failed run, never a measurement.  One such row was committed as
        # baseline.infer in r4 and corrupted the comparison (ADVICE r4).
        return {"error": "bench returned value=0.0 (all batches failed); "
                         "refusing to record as a measurement",
                "stderr_tail": p.stderr.strip().splitlines()[-1][:300]
                if p.stderr.strip() else ""}
    # canary-normalized throughput: value ÷ chip-canary TFLOP/s measured
    # in the SAME subprocess under the SAME flags.  Day-level chip/tunnel
    # drift (~10%, see bench.matmul_canary docstring) moves both numbers
    # together, so this ratio is the cross-day-comparable signal the raw
    # img/s is not (VERDICT r4 weak #2).
    if r.get("chip_canary_tflops"):
        r["per_canary"] = round(r["value"] / r["chip_canary_tflops"], 3)
    return r


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group()
    g.add_argument("--skip-train", action="store_true",
                   help="probe inference only")
    g.add_argument("--train-only", action="store_true",
                   help="probe the train step only (each run costs a "
                        "fresh ~5-7 min compile on the tunneled chip)")
    ap.add_argument("--only", default="",
                    help="comma-separated flag-set names to (re)run; "
                         "others keep their merged previous results")
    args = ap.parse_args()

    kinds = ("infer", "train")
    if args.skip_train:
        kinds = ("infer",)
    elif args.train_only:
        kinds = ("train",)
    only = {n for n in args.only.split(",") if n}
    unknown = only - set(FLAG_SETS)
    if unknown:
        ap.error(f"--only: unknown flag-set name(s) {sorted(unknown)}; "
                 f"known: {sorted(FLAG_SETS)}")
    res = {}
    if os.path.exists(OUT):  # merge across partial runs
        with open(OUT) as fh:
            res = json.load(fh)
    if not only:
        # full run: prune entries for flag sets renamed/removed since
        valid = {f"{n}.{k}" for n in FLAG_SETS for k in ("infer", "train")}
        res = {k: v for k, v in res.items()
               if k in valid or k.startswith("_")}
    import datetime
    stamp = {"date": datetime.date.today().isoformat(), "kinds": list(kinds),
             "note": "quiet host unless noted; tunneled v5e chip"}
    for name, flags in FLAG_SETS.items():
        if only and name not in only:
            continue
        for kind in kinds:
            r = run_bench(flags, train=(kind == "train"))
            key = f"{name}.{kind}"
            r["_conditions"] = stamp
            res[key] = r
            print(f"{key:24s} {json.dumps(r)}", flush=True)
            with open(OUT, "w") as fh:
                json.dump(res, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
