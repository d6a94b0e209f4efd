"""Misc image utilities (reference `utils.py:24-28`)."""

from __future__ import annotations

import numpy as np

__all__ = ["tensor2image"]


def tensor2image(tensor) -> np.ndarray:
    """[-1,1] (N,C,H,W) array -> uint8 RGB (3,H,W) of sample 0
    (reference tensor2image, utils.py:24-28)."""
    image = 127.5 * (np.asarray(tensor[0], dtype=np.float32) + 1.0)
    if image.shape[0] == 1:
        image = np.tile(image, (3, 1, 1))
    return image.astype(np.uint8)
