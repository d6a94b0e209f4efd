"""Evaluation loops (reference `utils.py:182-284`).

  * `eval_numbered`  — the 297-file `{i}_6.png`/`{i}_3.png` loop
    (utils.py:182-214)
  * `eval_6m`        — paired ImageDataset6mm loop (utils.py:218-242)
  * `eval_6m_baseline` — single-input baselines (utils.py:244-263)
  * `train_eval`     — random-sample self-reconstruction check
    (utils.py:270-284)

Inference runs through one jitted `sr_infer` (frequency split + A2B
forward, eval-mode BN); metrics are the skimage-compatible host
implementations (PSNR data_range=2, SSIM, MSE, NMI — utils.py:209-212).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ficsr_tpu.data.datasets import ImageDataset6mm, load_grayscale
from ficsr_tpu.data.pipeline import center_crop, normalize, to_unit
from ficsr_tpu.ops import metrics as M
from ficsr_tpu.ops.freq import RADII_A, frequency_split
from ficsr_tpu.train.state import MODELS

__all__ = ["make_sr_infer", "eval_numbered", "eval_6m", "eval_6m_baseline",
           "train_eval", "score_pair"]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _sr_infer(variables, x, train_mode, bf16, layout, fold=False):
    # `layout` is part of the jit cache key only: the modules read the
    # process-global layout at trace time, so keying on it here makes a
    # later set_layout() retrace instead of silently reusing a program
    # compiled for the old layout (ADVICE r2).  `fold` is both cache key
    # AND trace-scoped activation of the persistent-fold-region convs
    # (use_fold) so inference callers need not manage the global.
    from ficsr_tpu.models.layers import use_fold
    lf, hf = frequency_split(x, *RADII_A)
    if bf16:
        lf, hf = lf.astype(jnp.bfloat16), hf.astype(jnp.bfloat16)
    with use_fold(fold):
        out, _ = MODELS["a2b"].apply(
            variables, lf, hf, train=train_mode, mutable=["batch_stats"])
    return out[2].astype(jnp.float32)


def make_sr_infer(variables: dict, train_mode: bool = False,
                  bf16: bool = False, conv_fold: str = "auto") -> Callable:
    """Jitted LR->SR inference: split real_A at A-radii, run NetworkA2B.

    `variables` = {'params':..., 'batch_stats':...} for NetworkA2B.
    Matches the reference eval recipe (utils.py:202-205): hf radius 10
    averaged with the image, lf radius 8.  Params enter as jit
    *arguments*, so fresh weights (per-epoch sample dumps, eval after
    updates) reuse the compiled program instead of re-jitting a new
    closure — compiles cost minutes on the tunneled TPU.  bf16 runs the
    generator in bfloat16 activations (94.8 dB agreement with fp32).
    `conv_fold` resolves via resolve_conv_fold_infer (exact-equivalent
    persistent-fold-region convs; values pinned by tests/test_conv_fold).
    """
    from ficsr_tpu.models.layers import get_layout
    from ficsr_tpu.train.config import resolve_conv_fold_infer

    fn = lambda x: _sr_infer(variables, x, train_mode, bf16, get_layout(),
                             resolve_conv_fold_infer(conv_fold,
                                                     batch=x.shape[0]))
    fn.train_mode = train_mode  # read by _batched_scores' padding guard
    return fn


def score_pair(sr: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    return dict(
        psnr=M.peak_signal_noise_ratio(sr, gt, data_range=2),
        ssim=M.structural_similarity(sr, gt),
        mse=M.mean_squared_error(sr, gt),
        nmi=M.normalized_mutual_information(sr, gt),
    )


def _mean(scores) -> Dict[str, float]:
    keys = scores[0].keys()
    return {k: float(np.mean([s[k] for s in scores])) for k in keys}


def _batched_scores(infer: Callable, pairs, batch: int):
    """Score (lr, hr) numpy pairs through `infer` in fixed-size batches.

    Images are grouped by shape; each group runs in chunks of `batch`
    with the tail chunk zero-padded to the full batch size, so the jit
    compiles exactly once per distinct image shape (eval-mode BN is
    batch-size independent).  The reference loops batch-1 per image
    (utils.py:182-214); batching is pure throughput — identical scores.

    Padding is only score-identical under per-sample normalization: a
    train-mode-BN `infer` (make_sr_infer(train_mode=True)) would let the
    zero pad rows contaminate batch statistics of real rows, so for such
    an infer the tail chunk runs unpadded (one extra compile) instead.
    """
    pad_ok = not getattr(infer, "train_mode", False)
    groups: Dict[tuple, list] = {}
    for lr, hr in pairs:
        groups.setdefault(lr.shape, []).append((lr, hr))
    scores = []
    for shaped in groups.values():
        for i in range(0, len(shaped), batch):
            chunk = shaped[i:i + batch]
            x = np.stack([c[0] for c in chunk])[:, None]
            if len(chunk) < batch and pad_ok:
                pad = np.zeros((batch - len(chunk),) + x.shape[1:], x.dtype)
                x = np.concatenate([x, pad])
            sr = np.asarray(infer(jnp.asarray(x)))
            for j, (_, hr) in enumerate(chunk):
                scores.append(score_pair(sr[j, 0], hr))
    return scores


def eval_numbered(infer: Callable, lr_dir: str, hr_dir: str,
                  count: int = 297, verbose: bool = True,
                  batch: int = 8) -> Dict[str, float]:
    """Reference `eval` (utils.py:182-214): files {i}_6.png / {i}_3.png."""
    pairs = []
    for i in range(count):
        lr_path = os.path.join(lr_dir, f"{i}_6.png")
        hr_path = os.path.join(hr_dir, f"{i}_3.png")
        if not (os.path.isfile(lr_path) and os.path.isfile(hr_path)):
            continue
        lr = np.asarray(normalize(to_unit(jnp.asarray(load_grayscale(lr_path)))))
        hr = np.asarray(normalize(to_unit(jnp.asarray(load_grayscale(hr_path)))))
        pairs.append((lr, hr))
    scores = _batched_scores(infer, pairs, batch)
    result = _mean(scores) if scores else {}
    if verbose and result:
        print(" PSNR: %.4f SSIM: %.4f MSE: %.4f NMI: %.4f" % (
            result["psnr"], result["ssim"], result["mse"], result["nmi"]))
    return result


def eval_6m(infer: Callable, dataset: ImageDataset6mm,
            crop: int = 256, verbose: bool = True,
            batch: int = 8) -> Dict[str, float]:
    """Reference `eval_6m` (utils.py:218-242)."""
    pairs = []
    for i in range(len(dataset)):
        a_u8, b_u8 = dataset[i]
        a = center_crop(normalize(to_unit(jnp.asarray(a_u8))), crop)
        b = center_crop(normalize(to_unit(jnp.asarray(b_u8))), crop)
        pairs.append((np.asarray(a), np.asarray(b)))
    scores = _batched_scores(infer, pairs, batch)
    result = _mean(scores) if scores else {}
    if verbose and result:
        print(" PSNR: %.4f SSIM: %.4f MSE: %.4f NMI: %.4f" % (
            result["psnr"], result["ssim"], result["mse"], result["nmi"]))
    return result


def eval_6m_baseline(single_input_infer: Callable, dataset: ImageDataset6mm,
                     crop: int = 256) -> Dict[str, float]:
    """Reference `eval_6m_baseline` (utils.py:244-263): for models taking
    the raw LR image (no frequency split)."""
    scores = []
    for i in range(len(dataset)):
        a_u8, b_u8 = dataset[i]
        a = center_crop(normalize(to_unit(jnp.asarray(a_u8))), crop)
        b = center_crop(normalize(to_unit(jnp.asarray(b_u8))), crop)
        sr = single_input_infer(a[None, None])
        scores.append(score_pair(np.asarray(sr)[0, 0], np.asarray(b)))
    return _mean(scores) if scores else {}


def train_eval(infer: Callable, dataset, rng: np.random.RandomState,
               crop: int = 256) -> Dict[str, float]:
    """Reference `train_eval` (utils.py:270-284): self-reconstruction on
    one random training sample (PSNR/SSIM/MSE of SR vs its own input)."""
    i = int(rng.randint(0, len(dataset)))
    a_u8, _ = dataset[i]
    a = center_crop(normalize(to_unit(jnp.asarray(a_u8))), crop)
    sr = np.asarray(infer(a[None, None]))[0, 0]
    a_np = np.asarray(a)
    return dict(
        psnr=M.peak_signal_noise_ratio(sr, a_np, data_range=2),
        ssim=M.structural_similarity(sr, a_np),
        mse=M.mean_squared_error(sr, a_np),
    )
