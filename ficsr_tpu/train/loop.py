"""The training driver (reference `train.py:164-307`).

Epoch/batch loop around the single jitted train step: per-epoch LR
schedule, per-epoch sample dump, checkpoint cadence, and eval — the
same observable behavior as the reference, minus its host round-trips.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ficsr_tpu.data.datasets import ImageDataset, ImageDataset6mm
from ficsr_tpu.data.pipeline import preprocess_train_a, preprocess_train_b
from ficsr_tpu.parallel.mesh import (
    make_mesh, maybe_init_distributed, shard_batch,
    shard_train_step, state_shardings)
from ficsr_tpu.train import evaluate
from ficsr_tpu.train.config import TrainConfig
from ficsr_tpu.train.schedule import (
    cosine_annealing, cosine_bug_multipliers, lambda_linear_decay)
from ficsr_tpu.train.state import TrainState, create_train_state
from ficsr_tpu.train.step import build_train_step

__all__ = ["train", "save_sample", "a2b_train_for_epoch", "lr_for_epoch"]


def a2b_train_for_epoch(config: TrainConfig, epoch: int) -> bool:
    """eval-BN compat gate (TrainConfig.eval_bn_compat): the reference
    evals netG_A2B after every epoch (train.py:305) and utils.eval's
    `.eval()` (utils.py:186) is never undone, so every epoch after the
    process's first trained one runs A2B with frozen eval-mode BN."""
    return not (config.eval_bn_compat and epoch > config.epoch)


def save_sample(sample_dir: str, epoch: int, array: np.ndarray,
                suffix: str = "_real") -> None:
    """Grayscale JPEG dump of batch-0 (reference save_sample,
    utils.py:178-180)."""
    os.makedirs(sample_dir, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = np.asarray(array).squeeze()
    if out.ndim == 3:
        out = out[0]
    plt.imsave(os.path.join(
        sample_dir, f"image_alt_{epoch + 1}{suffix}.jpeg"), out, cmap="gray")


def _batch_iter(dataset: ImageDataset, batch: int, epoch: int,
                num_workers: int = 2):
    """Prefetched stacked uint8 (B,H,W) batches; drops the ragged tail.

    On multi-host pods each process loads only its rows of the global
    batch (deterministic partition — prefetch_batches `shard=`)."""
    from ficsr_tpu.data.prefetch import prefetch_batches

    yield from prefetch_batches(
        dataset, batch, epoch, num_workers=num_workers,
        shard=(jax.process_index(), jax.process_count()))


def train(config: TrainConfig, state: Optional[TrainState] = None,
          max_steps: Optional[int] = None) -> TrainState:
    maybe_init_distributed()  # no-op off-pod
    from ficsr_tpu.train.config import apply_layout
    apply_layout(config)  # measured training policy (auto): NHWC +
    # fold-region convs at batch>=8 on TPU, NCHW otherwise; --layout
    # NCHW/NHWC overrides (docs/architecture.md §6-7)
    # validate data before any (minutes-long) device compilation
    # (seed offset: each host's unaligned-B stream must differ, else all
    # hosts pick correlated B images for their disjoint A rows)
    dataset = ImageDataset(config.dataroot, unaligned=True,
                           seed=config.seed + jax.process_index())
    print(len(dataset))
    test_dataset = None
    if os.path.isdir(os.path.join(config.test_path, "LR")):
        test_dataset = ImageDataset6mm(config.test_path)

    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    if state is None:
        state = create_train_state(config, init_rng)

    if config.data_parallel and jax.device_count() > 1 and \
            config.batchSize % jax.device_count() == 0:
        mesh = make_mesh()
        replay_sharded = config.replay_shards > 1
        if replay_sharded:
            if config.replay_shards != mesh.size or \
                    config.batchSize % config.replay_shards:
                raise ValueError(
                    f"replay_shards={config.replay_shards} must equal the "
                    f"mesh size ({mesh.size}) and divide "
                    f"batchSize={config.batchSize}")
        def make_step(a2b_train=True):
            return shard_train_step(
                build_train_step(config, jit=False, a2b_train=a2b_train),
                mesh, state_template=state,
                replay_sharded=replay_sharded)
        state = jax.device_put(
            state, state_shardings(mesh, state, replay_sharded))
        put = lambda x: shard_batch(mesh, x)  # noqa: E731
    else:
        if config.replay_shards > 1 and \
                config.batchSize % config.replay_shards:
            raise ValueError(
                f"replay_shards={config.replay_shards} must divide "
                f"batchSize={config.batchSize}")
        def make_step(a2b_train=True):
            return build_train_step(config, a2b_train=a2b_train)
        put = lambda x: x  # noqa: E731

    from ficsr_tpu.train.checkpoint import CheckpointWriter
    ckpt_writer = CheckpointWriter(config.output_dir)
    try:
        state = _train_epochs(config, state, make_step, put, dataset,
                              test_dataset, rng, ckpt_writer, max_steps)
    finally:
        # drain pending async checkpoint writes on EVERY exit path
        # (exception/KeyboardInterrupt included) — a staged-but-unwritten
        # save must not be lost (ADVICE r2)
        ckpt_writer.close()
    return state


def _memory_hiwater_mb() -> Optional[float]:
    """Device HBM high-water in MiB, when the backend exposes it
    (memory_stats is optional in PJRT; axon/CPU may return None)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return round(peak / 2**20, 1) if peak else None


def lr_for_epoch(config, epoch):
    """LR fed into the jitted step for ABSOLUTE epoch index `epoch`.

    offset=0 in the linear branch, deliberately: the reference passes
    ``offset=opt.epoch`` to LambdaLR (train.py:105-108) because torch
    schedulers count their own steps from 0 in every process, so a
    resumed process must add the start epoch back.  This loop iterates
    absolute epochs (``range(config.epoch, n_epochs)``), so adding the
    offset again double-counts a resumed start epoch.  Measured
    consequence of the double-count (r5 TPU soak, benchmarks/
    soak_r05_resume.json before the fix): a run resumed at epoch 6 of a
    12-epoch decay-from-6 plan trained its first epoch at lr=0 (only BN
    stats moved) and every later epoch at NEGATIVE lr — gradient ascent
    — and both resumed soaks blew up at the first epoch transition
    (step ~54) while uninterrupted runs of the same plan were stable.
    """
    if config.scheduler:
        scale = lambda_linear_decay(
            epoch, config.n_epochs, 0, config.decay_epoch)
        assert scale >= 0.0, (epoch, config.n_epochs, config.decay_epoch)
        return config.lr * scale
    if config.cosine_bug_compat:
        sg, sd = cosine_bug_multipliers(epoch, config.n_epochs)
        return (config.lr * sg, config.lr * sd)
    return config.lr * cosine_annealing(epoch, config.n_epochs)


def _train_epochs(config, state, make_step, put, dataset, test_dataset, rng,
                  ckpt_writer, max_steps):
    total_steps = 0
    steps = {}  # a2b_train -> compiled step variant (at most two)
    mlog = open(config.metrics_jsonl, "a") if config.metrics_jsonl else None
    for epoch in range(config.epoch, config.n_epochs):
        a2b_train = a2b_train_for_epoch(config, epoch)
        if a2b_train not in steps:
            steps[a2b_train] = make_step(a2b_train)
        step_fn = steps[a2b_train]
        lr = lr_for_epoch(config, epoch)

        real_out = fake_out = None
        t0, seen = time.time(), 0

        def stage(batch):
            # runs ahead of the step (device_prefetch): H2D + preprocess
            # for batch N+1 dispatch while the step on batch N executes
            nonlocal rng
            a_u8, b_u8 = batch
            rng, ka, kb = jax.random.split(rng, 3)
            if jax.process_count() > 1:
                # decorrelate per-host crop randomness (same base stream
                # on every host by construction)
                ka = jax.random.fold_in(ka, jax.process_index())
                kb = jax.random.fold_in(kb, jax.process_index())
            real_a = put(preprocess_train_a(
                jnp.asarray(a_u8), config.sizeA, ka))
            real_b = put(preprocess_train_b(
                jnp.asarray(b_u8), config.sizeB, kb))
            return real_a, real_b

        from ficsr_tpu.data.prefetch import device_prefetch
        for i, (real_a, real_b) in enumerate(device_prefetch(
                _batch_iter(dataset, config.batchSize, epoch,
                            num_workers=config.n_cpu), stage)):
            state, metrics = step_fn(state, real_a, real_b, lr)
            seen += config.batchSize
            total_steps += 1

            if mlog is not None:
                import json
                rec = {k: float(v)
                       for k, v in jax.device_get(metrics).items()}
                rec.update(step=total_steps, epoch=epoch,
                           t=round(time.perf_counter(), 4))
                mlog.write(json.dumps(rec) + "\n")
                mlog.flush()

            if i == 1:
                # fetch only this host's first shard: a batch-sharded
                # global array spans non-addressable devices on a pod,
                # so np.asarray(real_a) would raise there — and the
                # dump only uses batch row 0 anyway
                real_out = np.asarray(real_a.addressable_shards[0].data)
                # sample through the updated generator (train.py:274-281)
                infer = evaluate.make_sr_infer({
                    "params": state.g_params["a2b"],
                    "batch_stats": state.g_stats["a2b"],
                })
                fake_out = np.asarray(infer(jnp.asarray(real_out[:1])))
            if config.log_every and i % config.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                print(f"epoch {epoch} it {i} "
                      + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())))
            if max_steps is not None and total_steps >= max_steps:
                break

        if real_out is not None:
            save_sample(config.sample_dir, epoch, real_out, "_input")
            save_sample(config.sample_dir, epoch, fake_out, "_output")

        dt = time.time() - t0
        print("Epoch (%d/%d) Finished — %.2f img/s" % (
            epoch + 1, config.n_epochs, seen / max(dt, 1e-9)))
        if mlog is not None:
            import json
            mlog.write(json.dumps({
                "epoch_summary": epoch, "img_per_sec":
                round(seen / max(dt, 1e-9), 2),
                "hbm_hiwater_mb": _memory_hiwater_mb(),
                "t": round(time.perf_counter(), 4)}) + "\n")
            mlog.flush()

        # checkpoint cadence (train.py:290-300)
        if config.pretrained:
            due = (epoch < config.decay_epoch and epoch % 5 == 4) or \
                (epoch >= config.decay_epoch)
        else:
            due = epoch % 3 == 2
        if due:
            # async: staged to host now, written while the next epoch
            # trains; drained by ckpt_writer.close() at loop exit
            ckpt_writer.save(jax.device_get(state), epoch + 1)

        if test_dataset is not None:
            infer = evaluate.make_sr_infer({
                "params": state.g_params["a2b"],
                "batch_stats": state.g_stats["a2b"],
            })
            evaluate.eval_6m(infer, test_dataset)
        print("------------------------------------------")

        if max_steps is not None and total_steps >= max_steps:
            break

    if mlog is not None:
        mlog.close()
    return state
