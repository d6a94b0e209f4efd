"""Synthetic test-image generators + memoize (reference
`pytorch_wavelets/pytorch_wavelets/utils.py:45-99,176-187` — the W12
test toys used by the vendored library's DTCWT test suite).

Pure numpy, broadcasting instead of the reference's ones-matrix
products; parity pinned by tests/test_testimg.py.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["drawedge", "drawcirc", "memoize"]


def drawedge(theta: float, r, w: float, N: int) -> np.ndarray:
    """N x N image of a raised-cosine edge going 0 -> 1 at `theta`
    degrees to the horizontal, passing through ij-coordinate `r`;
    the step profile is half a raised cosine `w` pels wide."""
    thetar = theta * np.pi / 180.0
    centre = (np.array([N, N], np.float64) - 1) / 2 + 1
    rr = -np.array([np.cos(thetar), np.sin(thetar)]) * \
        (np.asarray(r, np.float64) - centre)
    w = max(1.0, w)
    ramp = np.arange(N) - (N + 1) / 2
    # plane[i, j] = -sin(theta)*ramp[j] - r0 + (-cos(theta)*ramp[i]) - r1
    plane = (-np.sin(thetar) * ramp[None, :] - rr[0]) + \
        (-np.cos(thetar) * ramp[:, None] - rr[1])
    return 0.5 + 0.5 * np.sin(np.clip(plane * np.pi / w,
                                      -np.pi / 2, np.pi / 2))


def drawcirc(r: float, w: float, du: float, dv: float, N: int) -> np.ndarray:
    """N x N image of a circle of radius `r` centred at (du, dv) from
    the image centre, with a cosine-shaped edge of width `w`."""
    w = max(w, 1.0)
    # after the reference's final .T, dv offsets ROWS and du COLUMNS
    rows = (np.arange(N, dtype=np.float64) - (N + 1) / 2 - dv) / r
    cols = (np.arange(N, dtype=np.float64) - (N + 1) / 2 - du) / r
    g = np.exp(-0.5 * (rows[:, None] ** 2 + cols[None, :] ** 2))
    return 0.5 + 0.5 * np.sin(np.clip((g - np.exp(-0.5)) * (r * 3 / w),
                                      -np.pi / 2, np.pi / 2))


def memoize(obj):
    """Positional-args memoization decorator (ignores kwargs in the
    cache key, like the reference's)."""
    cache = obj.cache = {}

    @functools.wraps(obj)
    def memoizer(*args, **kwargs):
        if args not in cache:
            cache[args] = obj(*args, **kwargs)
        return cache[args]
    return memoizer
