#!/usr/bin/env python3
"""Production soak run: the BASELINE config-4 training program, long.

The reference's actual capability is 55-epoch CycleGAN training
(`/root/reference/train.py:164-307`); before r5 nothing in this repo had
ever composed more than 8 train steps (VERDICT r4 weak #1).  This
harness drives the REAL training driver (`ficsr_tpu.train.loop.train` —
data pipeline, prefetch, sample dumps, async checkpoints, per-epoch
eval, LR schedule included) at the config-4 program:

    batch 16, bf16, sizeA=128 -> sizeB=256, d_layers=5,
    layout auto (NHWC + persistent-fold-region convs on TPU)

on synthetic OCTA-like data (vessel-network images — no OCTA data exists
in either tree) for ~600 steps, then grades the run:

  * every loss term finite at every step; D/G neither collapsed nor
    diverged (D losses bounded away from 0 and infinity)
  * steps/sec stability: first-100 vs last-100 mean step time
  * HBM high-water per epoch (when the backend exposes memory_stats)
  * eval PSNR/SSIM before vs after (paired synthetic eval set)
  * async checkpoints landed on the epoch%3==2 cadence

Outputs: benchmarks/soak_r05.json (summary), the per-step record at
logs/soak_r05_metrics.jsonl (via TrainConfig.metrics_jsonl), and stdout
(redirect to logs/soak_r05.log).

Usage:  python benchmarks/soak.py [--steps 600] [--data DIR] [--keep]
"""

import argparse
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from ficsr_tpu import tpu_tuning  # noqa: E402

tpu_tuning.apply(train=True)  # before jax import

import numpy as np  # noqa: E402


# ---------------------------------------------------------------- data

def vessel_image(rng: np.random.RandomState, size: int,
                 n_vessels: int = 14) -> np.ndarray:
    """Synthetic OCTA-like angiogram: bright curvilinear vessel network
    on a dark speckled background, uint8 (size, size).

    Random-walk polylines with heading noise (vessels meander),
    thickness via a small box dilation, then Gaussian blur + speckle —
    matching the gross statistics the model's losses see (sparse bright
    structure, heavy high-frequency content), not any real dataset.
    """
    from scipy.ndimage import gaussian_filter

    img = np.zeros((size, size), np.float32)
    for _ in range(n_vessels):
        n = rng.randint(size, 2 * size)
        heading = rng.uniform(0, 2 * math.pi)
        dh = rng.normal(0.0, 0.25, n).cumsum() + heading
        step = rng.uniform(1.0, 2.0)
        xs = np.clip((rng.randint(0, size)
                      + np.cos(dh).cumsum() * step), 0, size - 1)
        ys = np.clip((rng.randint(0, size)
                      + np.sin(dh).cumsum() * step), 0, size - 1)
        bright = rng.uniform(0.6, 1.0)
        # thickness 1-3 px by stamping neighbor offsets (vectorized —
        # a per-vessel grey_dilation measured 0.7 s/image on this host)
        thick = rng.randint(1, 4)
        for dy in range(thick):
            for dx in range(thick):
                img[np.clip(ys.astype(int) + dy, 0, size - 1),
                    np.clip(xs.astype(int) + dx, 0, size - 1)] = bright
    img = gaussian_filter(img, sigma=0.8)
    img = img / max(img.max(), 1e-6)
    # multiplicative speckle + dark background noise (OCTA-like)
    img = img * rng.uniform(0.7, 1.0, img.shape) + \
        np.abs(rng.normal(0.0, 0.05, img.shape))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def degrade(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """LR-like degradation for the paired eval set: blur + noise."""
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(img.astype(np.float32), sigma=1.5)
    x = x + rng.normal(0, 6.0, x.shape)
    return np.clip(x, 0, 255).astype(np.uint8)


def make_dataset(root: str, n_train: int = 800, size: int = 320,
                 n_eval: int = 8, seed: int = 7) -> None:
    from PIL import Image

    rng = np.random.RandomState(seed)
    for sub in ("trainA", "trainB", "eval/LR", "eval/HR"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    t0 = time.time()
    for i in range(n_train):
        Image.fromarray(vessel_image(rng, size)).save(
            os.path.join(root, "trainA", f"{i:04d}.png"))
        Image.fromarray(vessel_image(rng, size)).save(
            os.path.join(root, "trainB", f"{i:04d}.png"))
    for i in range(n_eval):
        hr = vessel_image(rng, size)
        Image.fromarray(degrade(hr, rng)).save(
            os.path.join(root, "eval", "LR", f"{i:02d}_lr.png"))
        Image.fromarray(hr).save(
            os.path.join(root, "eval", "HR", f"{i:02d}_hr.png"))
    print(f"# synthesized {2 * n_train} train + {n_eval} eval pairs "
          f"in {time.time() - t0:.1f}s", flush=True)


# ------------------------------------------------------------- analyse

def analyse(metrics_path: str, window: int = 100) -> dict:
    steps, epochs = [], []
    with open(metrics_path) as fh:
        for line in fh:
            rec = json.loads(line)
            (epochs if "epoch_summary" in rec else steps).append(rec)
    loss_keys = sorted(k for k in steps[0]
                       if k not in ("step", "epoch", "t"))
    nonfinite = {k: sum(0 if math.isfinite(s[k]) else 1 for s in steps)
                 for k in loss_keys}
    series = {k: [s[k] for s in steps] for k in loss_keys}

    def win(vals, lo, hi):
        v = vals[lo:hi]
        return {"mean": round(float(np.mean(v)), 4),
                "min": round(float(np.min(v)), 4),
                "max": round(float(np.max(v)), 4)}

    dt = np.diff([s["t"] for s in steps])
    n = len(steps)
    out = {
        "n_steps": n,
        "nonfinite_counts": nonfinite,
        "all_finite": not any(nonfinite.values()),
        # first window skips step 0 (compile); dt[i] is step i+1's time
        "sec_per_step_first%d" % window:
            round(float(np.mean(dt[:window])), 4),
        "sec_per_step_last%d" % window:
            round(float(np.mean(dt[-window:])), 4),
        "sec_per_step_p50": round(float(np.median(dt)), 4),
        "sec_per_step_p99": round(float(np.percentile(dt, 99)), 4),
        "losses_first%d" % window:
            {k: win(series[k], 1, 1 + window) for k in loss_keys},
        "losses_last%d" % window:
            {k: win(series[k], n - window, n) for k in loss_keys},
        "hbm_hiwater_mb": [e.get("hbm_hiwater_mb") for e in epochs],
        "img_per_sec_per_epoch": [e.get("img_per_sec") for e in epochs],
    }
    # D-health: MSE-GAN D loss sits near 0.25 at equilibrium (D outputs
    # ~0.5 on both); collapse => ~0, blow-up => >> 1 sustained
    for side in ("loss_D_A", "loss_D_B"):
        last = out["losses_last%d" % window][side]
        out[side + "_healthy"] = bool(0.01 < last["mean"] < 2.0)
    gan_last = [out["losses_last%d" % window][k]["mean"]
                for k in ("loss_GAN_A2B", "loss_GAN_B2A")]
    out["g_gan_healthy"] = bool(all(0.01 < g < 10.0 for g in gan_last))
    return out


# ----------------------------------------------------------------- run

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--data", default=os.path.join(ROOT, ".soak_data"))
    ap.add_argument("--out", default=os.path.join(ROOT, ".soak_out"))
    ap.add_argument("--n-train", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--summary", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint under <out>/ckpt "
                         "and continue for --steps more steps — the TPU "
                         "restore demo: full state (both G, both D, both "
                         "opts, replay buffers, RNG) round-trips through "
                         "Orbax back into the live production driver")
    ap.add_argument("--plan-steps", type=int, default=None,
                    help="total steps the LR schedule is planned over "
                         "(default: --steps).  For an interrupt/resume "
                         "pair, pass the SAME --plan-steps to both legs "
                         "so the resumed run continues the identical "
                         "linear-decay schedule.  Measured consequence "
                         "of NOT doing this (benchmarks/soak_r05_"
                         "diverged.json): re-planning the schedule at "
                         "resume jumped lr 2.6x on the converged GAN "
                         "and the D pair diverged to ~5e4 losses within "
                         "an epoch while cycle/identity stayed anchored "
                         "— schedule continuity, not just state "
                         "continuity, is part of correct resume.")
    args = ap.parse_args()
    tag = "soak_r05_resume" if args.resume else "soak_r05"
    if args.metrics is None:
        args.metrics = os.path.join(ROOT, "logs", tag + "_metrics.jsonl")
    if args.summary is None:
        args.summary = os.path.join(ROOT, "benchmarks", tag + ".json")

    if not os.path.isdir(os.path.join(args.data, "trainA")):
        make_dataset(args.data, n_train=args.n_train)
    os.makedirs(os.path.dirname(args.metrics), exist_ok=True)
    if os.path.exists(args.metrics):
        os.remove(args.metrics)  # fresh record; analyse() reads it whole

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ficsr_tpu.data.datasets import ImageDataset6mm
    from ficsr_tpu.train import evaluate
    from ficsr_tpu.train.config import TrainConfig, apply_layout
    from ficsr_tpu.train.loop import train
    from ficsr_tpu.train.state import create_train_state

    steps_per_epoch = args.n_train // args.batch
    plan = args.plan_steps or args.steps
    plan_epochs = (plan + steps_per_epoch - 1) // steps_per_epoch
    epoch0 = 0
    if args.resume:
        from ficsr_tpu.train.checkpoint import latest_step
        last = latest_step(os.path.join(args.out, "ckpt"))
        if last is None:
            raise SystemExit(f"--resume: no checkpoint under "
                             f"{os.path.join(args.out, 'ckpt')}")
        # checkpoints are labeled epoch+1 (the reference's 1-based file
        # names, train.py:290-300), so `last` IS the next epoch index
        epoch0 = last
        if epoch0 >= plan_epochs:
            # measured consequence of silently extending instead
            # (soak_r05_resume2.json): the recomputed decay re-raised lr
            # from ~0 to 8.7e-5 on the fully-converged GAN and the D
            # pair hit ~100 MSE within 10 steps
            raise SystemExit(
                f"--resume: checkpoint epoch {epoch0} is already past "
                f"the planned schedule ({plan_epochs} epochs); pass a "
                f"longer --plan-steps to extend the schedule explicitly")
        print(f"# resuming at epoch {epoch0} "
              f"(checkpoint label {last})", flush=True)
    n_epochs = plan_epochs  # the plan IS the schedule, resumed or not
    cfg = TrainConfig(
        batchSize=args.batch, bf16=True, epoch=epoch0, n_epochs=n_epochs,
        decay_epoch=max(1, n_epochs // 2), scheduler=True,
        dataroot=args.data, test_path=os.path.join(args.data, "eval"),
        output_dir=os.path.join(args.out, "ckpt"),
        sample_dir=os.path.join(args.out, "samples"),
        metrics_jsonl=args.metrics, log_every=10, seed=0)
    print(cfg, flush=True)

    # eval BEFORE training — fresh init (learning-direction check), or
    # the restored state (restore-continuity check: should match the
    # prior run's final eval, not a fresh init's)
    apply_layout(cfg)
    state0 = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    if args.resume:
        from ficsr_tpu.train.checkpoint import restore_checkpoint
        state0 = restore_checkpoint(cfg.output_dir, state0)
    eval_ds = ImageDataset6mm(cfg.test_path)
    infer0 = evaluate.make_sr_infer(
        {"params": state0.g_params["a2b"],
         "batch_stats": state0.g_stats["a2b"]}, bf16=True)
    before = evaluate.eval_6m(infer0, eval_ds, verbose=False)
    print("# eval(init):", json.dumps(before), flush=True)
    start_state = state0 if args.resume else None
    del infer0
    if not args.resume:
        del state0  # free HBM; train() re-creates the identical init

    t0 = time.time()
    state = train(cfg, state=start_state, max_steps=args.steps)
    wall = time.time() - t0

    infer = evaluate.make_sr_infer(
        {"params": state.g_params["a2b"],
         "batch_stats": state.g_stats["a2b"]}, bf16=True)
    after = evaluate.eval_6m(infer, eval_ds, verbose=False)
    print("# eval(final):", json.dumps(after), flush=True)

    ckpts = sorted(os.listdir(os.path.join(args.out, "ckpt"))) \
        if os.path.isdir(os.path.join(args.out, "ckpt")) else []
    summary = {
        "config": "BASELINE config 4: b16 bf16 256^2 d_layers=5 "
                  "NHWC+fold-region, linear decay from epoch "
                  f"{cfg.decay_epoch}",
        "date": time.strftime("%Y-%m-%d"),
        "platform": jax.devices()[0].platform,
        "wall_seconds": round(wall, 1),
        "analysis": analyse(args.metrics),
        "eval_before": before,
        "eval_after": after,
        "checkpoints": ckpts,
    }
    with open(args.summary, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "analysis"}, indent=1))
    print(json.dumps(summary["analysis"], indent=1))
    print("wrote", args.summary)


if __name__ == "__main__":
    main()
