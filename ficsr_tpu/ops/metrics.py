"""Evaluation metrics, skimage-compatible (reference `utils.py:209-212`).

The reference scores eval images with skimage.metrics:
  peak_signal_noise_ratio(y, gt, data_range=2), structural_similarity
  (defaults: 7x7 uniform window, data_range=2 for float inputs),
  mean_squared_error, normalized_mutual_information (100 bins).

scikit-image is not in this environment, so these are independent
implementations of the same definitions: host-side numpy versions for
eval-loop parity plus jittable JAX versions (psnr/mse/ssim) for
in-graph monitoring.  The SSIM here is the *metric* flavor (uniform
window, sample-covariance normalization, border crop); the training
*loss* flavor (11x11 Gaussian window) lives in `ops/ssim.py`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "mean_squared_error",
    "peak_signal_noise_ratio",
    "structural_similarity",
    "normalized_mutual_information",
    "psnr_jax",
    "mse_jax",
]


def mean_squared_error(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.mean((a - b) ** 2))


def peak_signal_noise_ratio(image_true, image_test, data_range: float = 2.0) -> float:
    err = mean_squared_error(image_true, image_test)
    return float(10.0 * np.log10((data_range ** 2) / err))


def _uniform_filter2d(x: np.ndarray, size: int) -> np.ndarray:
    """scipy.ndimage.uniform_filter equivalent (mode='reflect', i.e.
    symmetric edge handling), separable box mean."""
    pad = size // 2
    # scipy 'reflect' == numpy 'symmetric'
    xp = np.pad(x, pad, mode="symmetric")
    c = np.cumsum(xp, axis=0, dtype=np.float64)
    c = np.concatenate([np.zeros((1, c.shape[1])), c], axis=0)
    rows = (c[size:] - c[:-size]) / size
    c = np.cumsum(rows, axis=1, dtype=np.float64)
    c = np.concatenate([np.zeros((c.shape[0], 1)), c], axis=1)
    out = (c[:, size:] - c[:, :-size]) / size
    # for even sizes scipy centers the window with one extra sample on
    # the left; slice accordingly
    h, w = x.shape
    return out[:h, :w]


def structural_similarity(im1: np.ndarray, im2: np.ndarray,
                          win_size: int = 7, data_range: float = 2.0,
                          K1: float = 0.01, K2: float = 0.03) -> float:
    """skimage.structural_similarity with default (uniform filter) config."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)
    f = lambda x: _uniform_filter2d(x, win_size)  # noqa: E731
    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
    )
    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def _entropy(p: np.ndarray) -> float:
    p = p[p > 0]
    p = p / p.sum()
    return float(-np.sum(p * np.log(p)))


def normalized_mutual_information(im1: np.ndarray, im2: np.ndarray,
                                  bins: int = 100) -> float:
    """(H(A) + H(B)) / H(A, B) from a joint 100-bin histogram
    (skimage.metrics.normalized_mutual_information semantics)."""
    hist, _ = np.histogramdd(
        [np.asarray(im1).ravel(), np.asarray(im2).ravel()], bins=bins
    )
    h1 = _entropy(hist.sum(axis=1))
    h2 = _entropy(hist.sum(axis=0))
    h12 = _entropy(hist.ravel())
    return (h1 + h2) / h12


# --- jittable variants -------------------------------------------------------


def mse_jax(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr_jax(image_true: jnp.ndarray, image_test: jnp.ndarray,
             data_range: float = 2.0) -> jnp.ndarray:
    return 10.0 * jnp.log10((data_range ** 2) / mse_jax(image_true, image_test))
