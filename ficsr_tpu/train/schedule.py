"""Learning-rate schedules (reference `utils.py:53-61`, `train.py:105-110`).

Both schedules are per-EPOCH multipliers on the base LR, applied by
feeding the scaled LR into the jitted step as a scalar — no
re-compilation per epoch.

The reference's cosine branch contains a bug (both schedulers wrap
optimizer_G, train.py:109-110) — we implement the *intended* behavior
and note the divergence.
"""

from __future__ import annotations

import math

__all__ = ["lambda_linear_decay", "cosine_annealing"]


def lambda_linear_decay(epoch: int, n_epochs: int, offset: int,
                        decay_start_epoch: int) -> float:
    """LambdaLR.step (utils.py:53-61): 1 - max(0, e+off-d)/(n-d)."""
    assert n_epochs - decay_start_epoch > 0, \
        "Decay must start before the training session ends!"
    return 1.0 - max(0, epoch + offset - decay_start_epoch) / (
        n_epochs - decay_start_epoch)


def cosine_annealing(epoch: int, t_max: int, eta_min: float = 0.0) -> float:
    """CosineAnnealingLR multiplier with eta_min=0 (train.py:109)."""
    return eta_min + (1.0 - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2
