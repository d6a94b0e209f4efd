"""Loss functions (reference model.py:17-83 + train.py:90-99,217-269).

Active training losses (train.py:221-236):
  * MSE GAN loss on the blended discriminator verdicts
  * L1 cycle loss
  * BCE-with-logits "inverse consistency" feature loss — NOTE the
    reference passes the *detached* forward feature as the BCE input
    (logits) and the *live* recovered feature as the target
    (train.py:230-231), so gradient flows only through the target via
    d/dtarget BCE = -logits... replicated verbatim in the train step
    with stop_gradient.
  * L1 identity loss

Auxiliary (constructed in the reference but inactive; provided for
parity): TV loss (computed at train.py:178, never added), phase
consistency (never called), VGG19 perceptual (call commented out),
SSIM loss (ops/ssim.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ficsr_tpu.ops.freq import gaussian_highpass_mask

__all__ = [
    "mse_loss",
    "l1_loss",
    "bce_with_logits",
    "gan_mse_loss",
    "tv_loss",
    "phase_consistency_loss",
]


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCEWithLogitsLoss (mean): max(x,0) - x*y + log1p(exp(-|x|))."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * target +
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_mse_loss(pred: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """LSGAN objective vs constant 1/0 targets (train.py:119-123,222-225)."""
    target = jnp.ones_like(pred) if is_real else jnp.zeros_like(pred)
    return mse_loss(pred, target)


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Anisotropic total variation (reference TVLoss, model.py:17-33)."""
    n, c, h, w = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, : h - 1, :]) ** 2)
    w_tv = jnp.sum((x[:, :, :, 1:] - x[:, :, :, : w - 1]) ** 2)
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / n


def phase_consistency_loss(x: jnp.ndarray, y: jnp.ndarray,
                           radius: float = 5.0) -> jnp.ndarray:
    """Negative cosine similarity of masked log-amplitude spectra
    (reference phase_consistency_loss, model.py:36-58).

    Operates on sample 0 like the reference (x[0]); inputs (N,C,H,W).
    """
    h, w = x.shape[-2], x.shape[-1]
    m = jnp.asarray(gaussian_highpass_mask(h, w, radius))

    def amp(v):
        f = jnp.fft.fftshift(jnp.fft.fft2(v[0]), axes=(-2, -1))
        return (m * jnp.log(jnp.abs(f))).ravel()

    ax, ay = amp(x), amp(y)
    cos = jnp.dot(ax, ay) / jnp.maximum(
        jnp.linalg.norm(ax) * jnp.linalg.norm(ay), 1e-8
    )
    return -cos
