"""Typed training configuration + CLI (reference `train.py:33-55`).

Flag names and defaults match the reference argparse surface for
entrypoint-shape parity.  One deliberate fix: the reference declares
boolean flags with ``type=bool``, so ``--pretrained False`` parses as
True (SURVEY §2a #1); we parse booleans correctly and document the
divergence here instead of reproducing the footgun.

TPU-specific additions (not in the reference, all defaulted off/auto):
``--bf16``, ``--remat``, ``--data_parallel``, ``--layout``,
``--fused_streams``.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass

__all__ = ["TrainConfig", "parse_args", "str2bool", "resolve_layout",
           "resolve_conv_fold", "resolve_conv_fold_infer", "apply_layout"]


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("yes", "true", "t", "y", "1"):
        return True
    if str(v).lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


@dataclass(frozen=True)
class TrainConfig:
    # --- reference flags (train.py:33-55), same names/defaults ---
    epoch: int = 0                 # starting epoch
    n_epochs: int = 50
    batchSize: int = 1
    dataroot: str = "./dataset/Colab_random_OCTA_augmented"
    pretrained_root: str = "./pre_trained/netG_A2B_pretrained.pth"
    pretrained: bool = False
    B2A: bool = False              # also save netG_B2A
    scheduler: bool = True         # True: linear decay; False: cosine
    lr: float = 1.3e-4
    decay_epoch: int = 10
    sizeA: int = 128
    sizeB: int = 256
    input_nc: int = 1
    output_nc: int = 1
    cuda: bool = True              # kept for CLI parity; device = jax default
    n_cpu: int = 2
    beta1: float = 0.25            # BCE feature weight (B side)
    beta2: float = 10.0            # identity L1
    beta3: float = 2.0             # cycle L1
    beta4: float = 0.5             # GAN A2B
    beta5: float = 0.5             # GAN B2A
    # --- TPU-native knobs ---
    bf16: bool = False             # bfloat16 activations (BASELINE config 4)
    # rematerialize generator forwards: with honest host-sync timing
    # remat measures SLOWER on v5e (b16-bf16: 581 vs 465 ms/step; b1:
    # 6.6 vs 5.8 relative) — default OFF; flip on only if a config
    # OOMs (benchmarks/README.md)
    remat: bool = False
    # stream-batched forwards: fold the six generator passes into four
    # (two at 2N batch) and the four D passes into two — bit-identical
    # semantics via per-stream BatchNorm (models/layers.use_streams).
    # Measured on v5e (honest sync, donate-off profiler): b1-fp32 full
    # step 82.7 ms fused vs 70.9 ms sequential (concat/slice stream
    # boundaries cost more than the larger convs recover — per-sample
    # conv cost here is batch-independent), and b16-bf16 fused OOMs
    # (residuals 26.6G vs 15.75G HBM).  Default OFF; kept as an option
    # because the equivalence is exact and other topologies may differ.
    fused_streams: bool = False
    d_layers: int = 5              # PatchGAN depth (reference: 5)
    data_parallel: bool = True     # shard the batch over all devices
    output_dir: str = "./output_exp"
    sample_dir: str = "./checkpoint_exp"
    test_path: str = "./dataset/evalution_6mm/parts"
    seed: int = 0
    log_every: int = 50
    # when set, the train loop appends one JSON line per step to this
    # path: {"step", "epoch", "t" (monotonic seconds), all loss terms,
    # and per-epoch device-memory high-water when the backend exposes
    # it}.  Fetching metrics every step syncs the host to the device
    # (it forfeits a little dispatch/execute overlap), so this is an
    # observability opt-in — used by benchmarks/soak.py for the
    # long-run health record (VERDICT r5 #1).
    metrics_jsonl: str = ""
    replay_buffer_size: int = 50
    # replay-buffer sharding under data parallelism.  1 (default) = the
    # reference's single global 50-slot history, kept replicated — XLA
    # all-gathers each step's fakes to every device (fine at b128;
    # ~0.7% of the step).  n>1 = n independent histories with a leading
    # shard axis sharded over the DP mesh: each device's fakes stay
    # local (no all-gather), at the documented cost of per-shard
    # instead of global history mixing.  Must equal the mesh size and
    # divide batchSize; intended for config-5-scale batches (b>=1024)
    # where the gather and the replicated (N,N) collision matrix grow.
    replay_shards: int = 1
    # activation layout inside the models: 'auto' = NHWC on TPU (measured
    # faster — benchmarks/conv_experiments.json), NCHW elsewhere.
    # Parameters/checkpoints are layout-free (stored OIHW).
    layout: str = "auto"
    # width-fold (space-to-depth) conv formulation inside the train step
    # (models/layers.use_fold): exact same function, faster per-conv
    # fwd+bwd for the 64-ch classes, but measured SLOWER composed into
    # the full step — 'auto' resolves OFF (see resolve_conv_fold).
    # 'on' folds every qualifying conv, 'k7' only the 7x7 valid stems,
    # 'region' runs whole 64-ch chains persistently folded (folded BN,
    # fold consumed by the stride-2 exits — models/generators.py).
    conv_fold: str = "auto"
    # reproduce the reference's cosine-branch scheduler bug
    # (train.py:109-110: BOTH CosineAnnealingLR instances wrap
    # optimizer_G): G's LR follows the double-stepped cosine = the
    # squared multiplier, D's LR never decays.  Only meaningful with
    # scheduler=False; default off = the intended cosine behavior.
    cosine_bug_compat: bool = False
    # reproduce the reference's eval-BN training quirk: utils.eval /
    # eval_6m call netG_A2B.eval() every epoch (utils.py:186,221) and
    # train.py never calls .train() again, so from the SECOND trained
    # epoch the reference trains netG_A2B with eval-mode BatchNorm —
    # frozen running stats used for normalization, none updated.
    # netG_B2A and both discriminators keep train-mode BN throughout.
    # Default off = every net trains in train mode (the intended
    # semantics); flip on for strict training-replication experiments.
    eval_bn_compat: bool = False

    @property
    def size_a_up(self) -> int:
        return self.sizeA * 2


def resolve_layout(layout: str = "auto", train: bool = False,
                   batch: int = None) -> str:
    """Resolve 'auto' to the measured-fastest activation layout.

    Inference: NHWC on TPU (806 vs 700 img/s side-by-side, +15%).
    Training on TPU: NHWC for batch >= 8 — it enables the
    persistent-fold-region convs (conv_fold auto -> 'region'), the r3
    train-step win (b16-bf16: 329 ms vs 465 NCHW — benchmarks/README.md
    round 3b).  Small batches keep NCHW (NHWC alone measured 23% slower
    at b1-fp32, 97.9 vs 79.7 ms; pass --layout NHWC to override).
    All numbers v5e, honest sync.
    """
    if layout != "auto":
        return layout
    import jax
    if jax.default_backend() != "tpu":
        return "NCHW"
    if train:
        return "NHWC" if (batch or 0) >= 8 else "NCHW"
    return "NHWC"


def resolve_conv_fold(config: "TrainConfig") -> bool:
    """Whether the train step should trace with the width-fold convs.

    Requires NHWC (the fold reshape is only free channels-last); 'auto'
    enables it on TPU when the active layout is NHWC.
    """
    from ficsr_tpu.models.layers import get_layout
    if config.conv_fold == "off":
        return False
    if get_layout() != "NHWC":
        if config.conv_fold in ("on", "k7", "region", "region-shallow"):
            raise ValueError(f"conv_fold={config.conv_fold!r} requires the "
                             "NHWC layout (use --layout NHWC)")
        return False
    if config.conv_fold in ("on", "k7", "region", "region-shallow"):
        return True if config.conv_fold == "on" else config.conv_fold
    # 'auto' (NHWC active): 'region' on TPU — the persistent-fold-region
    # formulation measured 329.4 vs 465.2 ms on the b16-bf16 step (r3b).
    # The r3a per-conv modes ('on'/'k7') stay opt-in only: their
    # per-conv fwd+bwd wins (4.21 vs 5.08 ms 3x3/64ch) did NOT survive
    # composition (518/470 vs 464 ms — relayout at every fold/unfold
    # boundary), which is exactly what the region mode fixes by keeping
    # BN/ReLU/residual consumers folded.  benchmarks/README.md round 3.
    import jax
    return "region" if jax.default_backend() == "tpu" else False


# Measured fold-region inference boundary on the v5e (bf16 NHWC 256^2,
# honest sync, benchmarks/README.md r3c): region wins 1.24-1.39x at
# b8-b64 (and +3% at b4) but LOSES at b1 (1.87 vs 1.98 ms — no batch
# rows to tile the folded conv's matmul with) and at b>=96 (1180 vs
# 1098 at b96, 1424 vs 1191 img/s at b128 — the plain path's
# batch-multiple-of-sublane tiling jump fills the MXU without the
# fold's 2x kernel-zero FLOPs).
_FOLD_INFER_MIN_BATCH = 4
_FOLD_INFER_MAX_BATCH = 64


def resolve_conv_fold_infer(conv_fold: str = "auto",
                            layout: str = None, batch: int = None):
    """Conv-fold mode for INFERENCE programs (bench.py, infer.py,
    serving).  Same contract as `resolve_conv_fold` but without a
    TrainConfig: returns False, 'region', 'k7' or True.

    'auto' is measured separately from training: the per-conv modes
    lose at inference (fwd-only pays the kernel-zero FLOP redundancy
    with no backward to amortize it), so 'auto' only ever considers the
    persistent-fold region, and only on TPU within the measured winning
    batch window [_FOLD_INFER_MIN_BATCH, _FOLD_INFER_MAX_BATCH] (pass
    the concrete per-call batch; None — e.g. a symbolic export batch —
    resolves to off, the safe-everywhere mode).
    """
    import jax

    from ficsr_tpu.models.layers import get_layout
    layout = layout or get_layout()
    if conv_fold == "off":
        return False
    if layout != "NHWC":
        if conv_fold in ("on", "k7", "region", "region-shallow"):
            raise ValueError(f"conv_fold={conv_fold!r} requires the "
                             "NHWC layout")
        return False
    if conv_fold in ("on", "k7", "region", "region-shallow"):
        return True if conv_fold == "on" else conv_fold
    if (jax.default_backend() == "tpu" and batch is not None
            and _FOLD_INFER_MIN_BATCH <= batch <= _FOLD_INFER_MAX_BATCH):
        return "region"
    return False


def apply_layout(config: "TrainConfig") -> str:
    """Resolve and activate the configured activation layout (training)."""
    from ficsr_tpu.models.layers import set_layout
    resolved = resolve_layout(config.layout, train=True,
                              batch=config.batchSize)
    set_layout(resolved)
    return resolved


def parse_args(argv=None) -> TrainConfig:
    p = argparse.ArgumentParser(
        description="Frequency-aware inverse-consistent OCTA SR (TPU)")
    defaults = TrainConfig()
    for f in dataclasses.fields(TrainConfig):
        default = getattr(defaults, f.name)
        if f.type in ("bool", bool) or isinstance(default, bool):
            p.add_argument(f"--{f.name}", type=str2bool, default=default)
        else:
            p.add_argument(f"--{f.name}", type=type(default), default=default)
    ns = p.parse_args(argv)
    return TrainConfig(**vars(ns))
