"""FFT-based Gaussian frequency splitting (reference `utils.py:71-163`).

The reference builds its Gaussian masks with O(H*W) Python loops in
numpy on every call (`utils.py:71-91`) and runs the FFT on a single
sample (`utils.py:94`, valid only at batch 1).  Here the mask is a
closed-form broadcast expression that XLA constant-folds inside the
jitted step, the two fftshifts collapse into one static `ifftshift` of
the mask, and everything is batched over arbitrary leading dims.

Exact semantics preserved:
  * high-pass mask  = 1 - exp(-0.5 d^2 / r^2)      (`utils.py:82-91`)
  * low-pass mask   =     exp(-0.5 d^2 / r^2)      (`utils.py:71-80`)
  * `low_pass` output is NEGATED (`utils.py:117`)
  * outputs are magnitudes (abs of the complex ifft)
  * train-time recipe hf := (high_pass(x, r) + x) / 2
    (`train.py:173-175,189-191,197-199,211-213`)
  * domain radii: A-side (hf=10, lf=8); B-side (hf=5, lf=14)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_lowpass_mask",
    "gaussian_highpass_mask",
    "bandreject_mask",
    "high_pass",
    "low_pass",
    "bandreject_pass",
    "frequency_split",
    "RADII_A",
    "RADII_B",
    "laplacian_edge",
    "sobel_edge",
]

# (hf_radius, lf_radius) per domain — train.py:173-175 / 197-199
RADII_A = (10.0, 8.0)
RADII_B = (5.0, 14.0)


@functools.lru_cache(maxsize=64)
def _shifted_dist_sq(h: int, w: int) -> np.ndarray:
    """Squared distance to the (H//2, W//2) center, already ifftshifted
    so it multiplies an *unshifted* FFT spectrum."""
    ci, cj = h // 2, w // 2
    i = np.arange(h, dtype=np.float32)[:, None]
    j = np.arange(w, dtype=np.float32)[None, :]
    d2 = (i - ci) ** 2 + (j - cj) ** 2
    return np.fft.ifftshift(d2)


def gaussian_lowpass_mask(h: int, w: int, radius: float) -> np.ndarray:
    """exp(-0.5 d^2/r^2), centered at (H//2, W//2), in SHIFTED layout."""
    d2 = np.fft.fftshift(_shifted_dist_sq(h, w))
    return np.exp(-0.5 * d2 / float(radius) ** 2).astype(np.float32)


def gaussian_highpass_mask(h: int, w: int, radius: float) -> np.ndarray:
    return (1.0 - gaussian_lowpass_mask(h, w, radius)).astype(np.float32)


def bandreject_mask(h: int, w: int, r_out: float, r_in: float) -> np.ndarray:
    """Binary annulus mask (reference `bandreject_filters`, utils.py:134-147)."""
    d2 = np.fft.fftshift(_shifted_dist_sq(h, w))
    keep = np.logical_and(d2 >= r_in ** 2, d2 <= r_out ** 2)
    return np.where(keep, 0.0, 1.0).astype(np.float32)


def _apply_mask(x: jnp.ndarray, shifted_mask: np.ndarray) -> jnp.ndarray:
    """|ifft2(fft2(x) * ifftshift(mask))| over the last two axes.

    Computed with rfft2/irfft2: the input is real and every mask here
    is even-symmetric in unshifted layout (built from the squared
    distance to the (H//2, W//2) center), so the masked spectrum stays
    exactly Hermitian and the complex ifft2 is exactly real — the
    reference's `abs(ifft2(.))` (utils.py:101) equals `|irfft2(.)|` at
    half the FFT work and bandwidth.
    """
    h, w = x.shape[-2], x.shape[-1]
    m = jnp.asarray(np.fft.ifftshift(shifted_mask)[..., : w // 2 + 1])
    f = jnp.fft.rfft2(x.astype(jnp.float32))
    return jnp.abs(jnp.fft.irfft2(f * m, s=(h, w))).astype(jnp.float32)


def high_pass(x: jnp.ndarray, radius: float = 4.0) -> jnp.ndarray:
    """Gaussian high-pass magnitude (reference `high_pass`, utils.py:93-103).

    Batched: filters every (..., H, W) image independently (the
    reference filters only sample 0 and broadcasts — identical at
    batch 1, and the correct generalization beyond it).
    """
    h, w = x.shape[-2], x.shape[-1]
    return _apply_mask(x, gaussian_highpass_mask(h, w, radius))


def low_pass(x: jnp.ndarray, radius: float = 10.0) -> jnp.ndarray:
    """NEGATED Gaussian low-pass magnitude (reference utils.py:105-117)."""
    h, w = x.shape[-2], x.shape[-1]
    return -_apply_mask(x, gaussian_lowpass_mask(h, w, radius))


def bandreject_pass(x: jnp.ndarray, r_out: float = 300.0,
                    r_in: float = 35.0) -> jnp.ndarray:
    """Band-reject magnitude (reference utils.py:119-132)."""
    h, w = x.shape[-2], x.shape[-1]
    return _apply_mask(x, bandreject_mask(h, w, r_out, r_in))


def frequency_split(x: jnp.ndarray, hf_radius: float,
                    lf_radius: float,
                    strict_batch1: bool = False,
                    rfft: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The generator input recipe: (lf, hf) with hf pre-averaged with x.

    hf = (high_pass(x, hf_radius) + x) / 2 ; lf = low_pass(x, lf_radius)
    — exactly the per-call-site pattern in `train.py:173-175` etc.
    One FFT of x is shared by both branches.

    strict_batch1=True reproduces the reference's literal behavior at
    batch > 1: only sample 0 is filtered and its spectrum broadcasts to
    the whole batch (`train.py:173`, `utils.py:94`) — identical to the
    default at batch 1; exposed for exact-replication experiments.

    rfft=True (default, inference): real-input FFT at half the work —
    forward-identical because the masked spectrum is exactly Hermitian
    (see _apply_mask).  The *backward* differs from torch's at
    near-zero magnitudes (torch's complex-abs adjoint keeps a gradient
    component along the noise-level imaginary direction; rfft has no
    such component), so the differentiated training split
    (train/step.py) passes rfft=False for bit-level torch-backward
    compatibility — measured probe error 6e-3 vs the 5e-3 parity
    budget otherwise.
    """
    h, w = x.shape[-2], x.shape[-1]
    src = x[:1] if (strict_batch1 and x.ndim == 4) else x
    if rfft:
        f = jnp.fft.rfft2(src.astype(jnp.float32))
        m_hi = jnp.asarray(np.fft.ifftshift(
            gaussian_highpass_mask(h, w, hf_radius))[..., : w // 2 + 1])
        m_lo = jnp.asarray(np.fft.ifftshift(
            gaussian_lowpass_mask(h, w, lf_radius))[..., : w // 2 + 1])
        hf = jnp.abs(jnp.fft.irfft2(f * m_hi, s=(h, w))).astype(jnp.float32)
        lf = -jnp.abs(jnp.fft.irfft2(f * m_lo, s=(h, w))).astype(jnp.float32)
    else:
        f = jnp.fft.fft2(src.astype(jnp.float32))
        m_hi = jnp.asarray(np.fft.ifftshift(
            gaussian_highpass_mask(h, w, hf_radius)))
        m_lo = jnp.asarray(np.fft.ifftshift(
            gaussian_lowpass_mask(h, w, lf_radius)))
        hf = jnp.abs(jnp.fft.ifft2(f * m_hi)).astype(jnp.float32)
        lf = -jnp.abs(jnp.fft.ifft2(f * m_lo)).astype(jnp.float32)
    if strict_batch1 and x.ndim == 4:
        hf = jnp.broadcast_to(hf, x.shape)
        lf = jnp.broadcast_to(lf, x.shape)
    hf = (hf + x) * 0.5
    return lf, hf


# --- small conv edge detectors (reference utils.py:149-163) -----------------


def laplacian_edge(x: jnp.ndarray) -> jnp.ndarray:
    """8-connected Laplacian, 'same' padding (reference `laplacian_kernel`)."""
    from jax import lax

    k = jnp.asarray(
        [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]],
        jnp.float32,
    ).reshape(1, 1, 3, 3)
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def sobel_edge(x: jnp.ndarray) -> jnp.ndarray:
    """4-connected Laplacian, VALID padding (reference `functional_conv2d`)."""
    from jax import lax

    k = jnp.asarray(
        [[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]], jnp.float32
    ).reshape(1, 1, 3, 3)
    return lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
