"""OCTA datasets (reference `dataset.py:10-61`).

  * `ImageDataset`     — unpaired CycleGAN set: `root/trainA/*` (6mm LR)
    and `root/trainB/*` (3mm HR), grayscale, unaligned B sampling.
  * `ImageDataset6mm`  — paired eval set: `root/LR/*` paired to HR by
    the `_lr.` -> `_hr.` / `LR` -> `HR` path rewrite (dataset.py:52-53).

Images load through PIL into uint8 numpy; all math (crop, bicubic x2
upscale, [-1,1] normalize) runs on device in `pipeline.py`.  The
reference's per-item 'C' output (A with an extra Normalize) is unused
by its train loop (SURVEY §2a #19) and is not reproduced.
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

__all__ = ["ImageDataset", "ImageDataset6mm", "load_grayscale"]


def load_grayscale(path: str) -> np.ndarray:
    """PNG/JPEG -> uint8 (H, W) grayscale ('L' conversion like PIL)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


class ImageDataset:
    """Unpaired A/B dataset with epoch-stable RNG for the unaligned
    B index (replaces the reference's `random.randint`, dataset.py:28)."""

    def __init__(self, root: str, unaligned: bool = True,
                 seed: int = 0):
        self.files_a: List[str] = sorted(
            glob.glob(os.path.join(root, "trainA") + "/*.*"))
        self.files_b: List[str] = sorted(
            glob.glob(os.path.join(root, "trainB") + "/*.*"))
        if not self.files_a or not self.files_b:
            raise FileNotFoundError(
                f"no images under {root}/trainA or {root}/trainB")
        self.unaligned = unaligned
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return max(len(self.files_a), len(self.files_b))

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        a = load_grayscale(self.files_a[index % len(self.files_a)])
        if self.unaligned:
            b_idx = int(self._rng.randint(0, len(self.files_b)))
        else:
            b_idx = index % len(self.files_b)
        b = load_grayscale(self.files_b[b_idx])
        return a, b

    def shuffled_indices(self, epoch: int) -> np.ndarray:
        # Deterministic ACROSS PROCESSES: multi-host data sharding
        # (prefetch_batches shard=) slices every host's shard out of
        # this permutation, so it must be identical on every host.
        # Python's hash() is PYTHONHASHSEED-salted per process — using
        # it here silently gave each host a different permutation
        # (duplicated + dropped samples per global batch).
        rng = np.random.RandomState((0x5EED ^ (2654435761 * (epoch + 1)))
                                    % (2 ** 31))
        return rng.permutation(len(self))


class ImageDataset6mm:
    """Paired LR/HR eval set (reference ImageDataset_6mm)."""

    def __init__(self, root: str):
        self.files_a: List[str] = sorted(
            glob.glob(os.path.join(root, "LR") + "/*.*"))
        if not self.files_a:
            raise FileNotFoundError(f"no images under {root}/LR")

    def __len__(self) -> int:
        return len(self.files_a)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        path_a = self.files_a[index % len(self.files_a)]
        path_b = path_a.replace("_lr.", "_hr.").replace("LR", "HR")
        return load_grayscale(path_a), load_grayscale(path_b)
