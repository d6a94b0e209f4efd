"""Differentiable SSIM (reference `ssim.py:7-73`).

Gaussian-window SSIM: 11x11 window, sigma 1.5, zero 'same' padding,
C1=0.01^2, C2=0.03^2 — identical to the reference's window-conv
formulation.  The reference runs five grouped convolutions; here the
five moment maps come from ONE conv over a stacked 5-channel tensor
(x, y, x^2, y^2, xy folded into batch), which XLA fuses into a single
pass on the conv engine.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["ssim", "SSIM", "gaussian_window"]


@functools.lru_cache(maxsize=8)
def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Separable 2-D Gaussian window, normalized to sum 1 (ssim.py:7-15)."""
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
         for x in range(window_size)],
        dtype=np.float32,
    )
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _window_means(stacked: jnp.ndarray, window: jnp.ndarray,
                  window_size: int) -> jnp.ndarray:
    pad = window_size // 2
    k = window.reshape(1, 1, window_size, window_size)
    return lax.conv_general_dilated(
        stacked, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True, sigma: float = 1.5) -> jnp.ndarray:
    """SSIM of two (N,C,H,W) images in [-1, 1] (reference `_ssim`)."""
    n, c, h, w = img1.shape
    win = jnp.asarray(gaussian_window(window_size, sigma), img1.dtype)
    stacked = jnp.stack(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=2
    ).reshape(n * c * 5, 1, h, w)
    m = _window_means(stacked, win, window_size).reshape(n, c, 5, h, w)
    mu1, mu2, e_x2, e_y2, e_xy = (m[:, :, i] for i in range(5))

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = e_x2 - mu1_sq
    sigma2_sq = e_y2 - mu2_sq
    sigma12 = e_xy - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


class SSIM:
    """Callable wrapper matching the reference `ssim.SSIM` module."""

    def __init__(self, window_size: int = 11, size_average: bool = True):
        self.window_size = window_size
        self.size_average = size_average

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        return ssim(img1, img2, self.window_size, self.size_average)
