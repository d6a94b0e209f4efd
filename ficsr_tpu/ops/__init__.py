"""Frequency/signal ops, SSIM, and evaluation metrics."""

from ficsr_tpu.ops.freq import (
    RADII_A,
    RADII_B,
    bandreject_pass,
    frequency_split,
    high_pass,
    low_pass,
)
from ficsr_tpu.ops.ssim import SSIM, ssim
from ficsr_tpu.ops import metrics

__all__ = [
    "RADII_A", "RADII_B", "bandreject_pass", "frequency_split",
    "high_pass", "low_pass", "SSIM", "ssim", "metrics",
]
