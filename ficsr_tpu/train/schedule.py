"""Learning-rate schedules (reference `utils.py:53-61`, `train.py:105-110`).

Both schedules are per-EPOCH multipliers on the base LR, applied by
feeding the scaled LR into the jitted step as a scalar — no
re-compilation per epoch.

The reference's cosine branch contains a bug (both schedulers wrap
optimizer_G, train.py:109-110) — we implement the *intended* behavior
by default and the bug-exact behavior behind
``TrainConfig.cosine_bug_compat`` (see `cosine_bug_multipliers`).
"""

from __future__ import annotations

import math

__all__ = ["lambda_linear_decay", "cosine_annealing",
           "cosine_bug_multipliers"]


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


def cosine_bug_multipliers(epoch: int, t_max: int) -> tuple:
    """(g_scale, d_scale) reproducing the reference's cosine-branch bug.

    `train.py:109-110` constructs BOTH CosineAnnealingLR schedulers on
    `optimizer_G`, so per epoch optimizer_G's LR is stepped through the
    recursive cosine update twice while optimizer_D's LR is never
    touched.  CosineAnnealingLR's recursion with eta_min=0 multiplies by
    r(t) = (1+cos(pi*t/T)) / (1+cos(pi*(t-1)/T)) each step, which
    telescopes, so double-stepping yields exactly the SQUARED cosine
    multiplier for G — and a constant 1.0 for D.
    """
    g = ((1 + math.cos(math.pi * epoch / t_max)) / 2) ** 2
    return g, 1.0
