"""Synthetic test-image generators + memoize (reference
`pytorch_wavelets/pytorch_wavelets/utils.py:45-99,176-187` — the W12
test toys used by the vendored library's DTCWT test suite).

Pure numpy, broadcasting instead of the reference's ones-matrix
products; parity pinned by tests/test_testimg.py.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["drawedge", "drawcirc", "natural_image", "memoize"]


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


def natural_image(N: int = 256, channels: int = 3,
                  seed: int = 0) -> np.ndarray:
    """Deterministic natural-image-like fixture, (channels, N, N) float32
    in [0, 1].

    Plays the role of the reference suite's real-photo fixtures
    (barbara/mandrill `.npz`, loaded at
    `pytorch_wavelets/tests/test_dtcwt.py:31-44`) without shipping a
    photograph: a composite of the statistics wavelet transforms
    actually respond to — oriented raised-cosine edges at non-axis
    angles, curved contours (circles of varied radius/edge width),
    1/f-spectrum texture (the power law of natural scenes), and a
    smooth illumination field.  Everything is closed-form or seeded, so
    the fixture is bit-stable across runs and machines.
    """
    rng = np.random.RandomState(seed)
    fy = np.fft.fftfreq(N)[:, None]
    fx = np.fft.fftfreq(N)[None, :]
    radial = np.hypot(fy, fx)
    radial[0, 0] = 1.0 / N  # keep DC finite; it is rescaled away below
    yy = np.linspace(0.0, 1.0, N)[:, None]
    xx = np.linspace(0.0, 1.0, N)[None, :]
    chans = []
    for c in range(channels):
        img = np.zeros((N, N), np.float64)
        for k, theta in enumerate((15.0, 72.5, 130.0)):
            r = (N + 1) / 2 + (k - 1) * N / 6.0 + 7 * c
            img += drawedge(theta + 9 * c, [r, r], 3.0 + 2 * k, N) / 3.0
        for k in range(3):
            img += 0.5 / 3.0 * drawcirc(
                N / (5.0 + 2 * k), 2.0 + k,
                (k - 1) * N / 5.0 + 3 * c, (1 - k) * N / 6.0 - 2 * c, N)
        phase = np.exp(2j * np.pi * rng.rand(N, N))
        tex = np.fft.ifft2(phase / radial ** 1.1).real
        img += 0.25 * tex / np.abs(tex).max()
        img += 0.15 * np.sin(2 * np.pi * (0.7 * yy + 0.4 * xx) + c)
        img -= img.min()
        chans.append(img / img.max())
    return np.stack(chans).astype(np.float32)


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
