"""Generator-only paired fine-tuning (BASELINE config 3).

Supervised refinement of NetworkA2B on paired LR/HR data (the
`ImageDataset6mm` layout): loss = L1 + lambda_ssim * (1 - SSIM) +
lambda_wavelet * multi-scale DWT-subband L1 — one jitted step, AdamW,
single generator.  This capability has no direct reference counterpart
(the reference only trains the full CycleGAN) but is the standard
paired-fine-tune recipe its eval pipeline implies, and is named
explicitly by the driver's BASELINE config ladder.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ficsr_tpu.models.losses import l1_loss
from ficsr_tpu.ops.freq import RADII_A, frequency_split
from ficsr_tpu.ops.ssim import ssim
from ficsr_tpu.train.state import MODELS, make_optimizer
from ficsr_tpu.wavelets import wavedec2

__all__ = ["FinetuneState", "create_finetune_state", "build_finetune_step",
           "wavelet_loss"]


@flax.struct.dataclass
class FinetuneState:
    params: Any
    stats: Any
    opt: optax.OptState
    step: jnp.ndarray


def wavelet_loss(sr: jnp.ndarray, hr: jnp.ndarray, wave: str = "haar",
                 levels: int = 3) -> jnp.ndarray:
    """Multi-scale DWT-subband L1: sum over scales of |W(sr) - W(hr)|."""
    yl_s, yh_s = wavedec2(sr, wave, "reflect", level=levels)
    yl_h, yh_h = wavedec2(hr, wave, "reflect", level=levels)
    loss = l1_loss(yl_s, yl_h)
    for a, b in zip(yh_s, yh_h):
        loss = loss + l1_loss(a, b)
    return loss


def create_finetune_state(rng: jax.Array, size: int = 256,
                          variables: Optional[dict] = None) -> FinetuneState:
    """Fresh or pretrained-initialized (convert.from_torch) state."""
    model = MODELS["a2b"]
    if variables is None:
        dummy = jnp.zeros((1, 1, size, size), jnp.float32)
        variables = model.init(rng, dummy, dummy, train=False)
    tx = make_optimizer()
    return FinetuneState(
        params=variables["params"],
        stats=variables["batch_stats"],
        opt=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def build_finetune_step(lambda_ssim: float = 1.0,
                        lambda_wavelet: float = 0.5,
                        wave: str = "haar", levels: int = 3,
                        jit: bool = True, donate: bool = True):
    """step(state, lr_img, hr_img, lr) -> (state, metrics).

    lr_img/hr_img: (N,1,H,W) in [-1,1]; the LR image goes through the
    reference inference recipe (frequency split at A radii).
    """
    tx = make_optimizer()
    model = MODELS["a2b"]
    from ficsr_tpu.train.config import TrainConfig, resolve_conv_fold
    from ficsr_tpu.models.layers import use_fold
    # same fold policy as the main train step (reads the active layout;
    # 'region' on TPU-NHWC — r3b, 329 vs 465 ms on the b16-bf16 step)
    fold = resolve_conv_fold(TrainConfig())

    def loss_fn(params, stats, lr_img, hr_img):
        lf, hf = frequency_split(lr_img, *RADII_A)
        (_, _, sr), mut = model.apply(
            {"params": params, "batch_stats": stats}, lf, hf, train=True,
            mutable=["batch_stats"])
        l_l1 = l1_loss(sr, hr_img)
        l_ssim = 1.0 - ssim(sr, hr_img)
        l_wav = wavelet_loss(sr, hr_img, wave, levels)
        loss = l_l1 + lambda_ssim * l_ssim + lambda_wavelet * l_wav
        metrics = dict(loss=loss, l1=l_l1, ssim_loss=l_ssim, wavelet=l_wav)
        return loss, (mut["batch_stats"], metrics)

    def step(state: FinetuneState, lr_img, hr_img, lr
             ) -> Tuple[FinetuneState, Dict[str, jnp.ndarray]]:
        with use_fold(fold):
            (_, (stats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.stats,
                                       lr_img, hr_img)
        opt = state.opt
        hp = dict(opt.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt = opt._replace(hyperparams=hp)
        updates, opt = tx.update(grads, opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, stats=stats, opt=opt,
                             step=state.step + 1), metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
