"""Wavelet filter coefficient tables (pywt-free).

The reference stack resolves wavelet names through PyWavelets
(`/root/reference/pytorch_wavelets/pytorch_wavelets/dwt/transform2d.py:22-26`)
and uses `pywt.dwt_coeff_len` for output-size computation
(`dwt/lowlevel.py:153`).  On TPU we embed the coefficient tables directly:

  * Daubechies (``dbN``) orthonormal filters are *generated* by spectral
    factorization of the half-band Daubechies polynomial (standard
    construction, see Daubechies "Ten Lectures on Wavelets", ch. 6) —
    no digits are hardcoded, so any order N works.
  * Symlets (``symN``) use the least-asymmetric root selection of the
    same factorization.
  * Biorthogonal spline (CDF) filters (``biorX.Y``) are exact dyadic
    rationals times sqrt(2); they are constructed from B-spline
    factorizations, except the irrational CDF 9/7 pair (``bior4.4``).
  * ``haar`` == ``db1``.

Conventions match PyWavelets:
  dec_lo/dec_hi are the *analysis* filters (time-reversed synthesis for
  orthogonal wavelets), rec_lo/rec_hi the synthesis filters.  The DWT
  engine (lowlevel.py) flips dec_* before feeding the correlation-style
  convolution, exactly as the reference's ``prep_filt_afb1d``
  (`dwt/lowlevel.py:956-975`).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import numpy as np

__all__ = [
    "Wavelet",
    "get_wavelet",
    "wavelist",
    "dwt_coeff_len",
    "daubechies_scaling_filter",
    "qmf",
]


# ---------------------------------------------------------------------------
# Filter construction
# ---------------------------------------------------------------------------


def qmf(h: np.ndarray) -> np.ndarray:
    """Quadrature-mirror filter: g[k] = (-1)^k h[L-1-k]."""
    g = np.asarray(h, dtype=np.float64)[::-1].copy()
    g[1::2] = -g[1::2]
    return g


def _daubechies_roots(N: int) -> np.ndarray:
    """Roots (inside unit circle) of the Daubechies half-band factor."""
    # P(y) = sum_{k=0}^{N-1} C(N-1+k, k) y^k ; roots in y.
    p = [math.comb(N - 1 + k, k) for k in range(N - 1, -1, -1)]
    y_roots = np.roots(np.asarray(p, dtype=np.float64)) if N > 1 else np.array([])
    z_roots = []
    for y in y_roots:
        # y = (2 - z - 1/z) / 4  =>  z^2 + (4y - 2) z + 1 = 0
        zr = np.roots([1.0, 4.0 * y - 2.0, 1.0])
        z_roots.append(zr[np.argmin(np.abs(zr))])
    return np.asarray(z_roots)


@functools.lru_cache(maxsize=None)
def daubechies_scaling_filter(N: int, least_asymmetric: bool = False) -> Tuple[float, ...]:
    """Length-2N orthonormal scaling (rec_lo) filter for dbN / symN.

    Minimum-phase root selection gives Daubechies; for symlets we flip
    the roots whose flipping reduces a phase-nonlinearity measure
    (least-asymmetric choice).
    """
    if N < 1:
        raise ValueError("N must be >= 1")
    if N == 1:
        s = 1.0 / math.sqrt(2.0)
        return (s, s)
    roots = _daubechies_roots(N)
    if least_asymmetric:
        h = _best_phase_filter(roots, N)
    else:
        h = _filter_from_roots(roots, N)
        # Orient to the pywt convention for rec_lo (minimum-phase db
        # filters start at the large-magnitude end).
        if abs(h[0]) < abs(h[-1]):
            h = h[::-1]
    return tuple(h.tolist())


def _filter_from_roots(roots: np.ndarray, N: int) -> np.ndarray:
    poly = np.poly1d([1.0])
    for z in roots:
        poly = poly * np.poly1d([1.0, -z])
    for _ in range(N):
        poly = poly * np.poly1d([0.5, 0.5])
    h = np.real(poly.coeffs).astype(np.float64)
    return h * (math.sqrt(2.0) / h.sum())


def _best_phase_filter(roots: np.ndarray, N: int) -> np.ndarray:
    """Symlet (least-asymmetric) selection.

    Group the spectral-factorization roots into conjugate pairs; each
    group may be swapped for its reciprocal-conjugate pair without
    changing |H|.  Enumerate all 2^g choices (g <= N/2, tiny) and keep
    the filter with the most linear phase.
    """
    groups = []
    used = np.zeros(len(roots), dtype=bool)
    for i, z in enumerate(roots):
        if used[i]:
            continue
        used[i] = True
        if abs(z.imag) < 1e-12:
            groups.append([complex(z.real)])
        else:
            for j in range(i + 1, len(roots)):
                if not used[j] and abs(roots[j] - np.conj(z)) < 1e-8:
                    used[j] = True
                    break
            groups.append([z, np.conj(z)])

    def build(sel):
        chosen = []
        for g, flip in zip(groups, sel):
            for z in g:
                chosen.append(1.0 / np.conj(z) if flip else z)
        return _filter_from_roots(np.asarray(chosen), N)

    def nonlinearity(h):
        H = np.fft.fft(h, 512)
        w = np.arange(256)
        phase = np.unwrap(np.angle(H[:256]))
        k = (phase[-1] - phase[0]) / max(len(w) - 1, 1)
        lin = phase[0] + k * w
        return float(np.sum((phase - lin) ** 2))

    best, best_v = None, np.inf
    for m in range(2 ** len(groups)):
        sel = [(m >> i) & 1 for i in range(len(groups))]
        h = build(sel)
        v = nonlinearity(h)
        if v < best_v:
            best_v, best = v, h
    return best


# --- Biorthogonal spline (CDF) filters -------------------------------------
# Exact dyadic tables (multiples of sqrt(2)), per the CDF construction.
# Entries: name -> (dec_lo, rec_lo) as dyadic fraction lists; dec_hi/rec_hi
# follow from the biorthogonal alternating-sign relations used by pywt:
#   dec_hi[n] = (-1)^(n+1) * rec_lo[n]
#   rec_hi[n] = (-1)^n      * dec_lo[n]
# (verified against the perfect-reconstruction property in the tests).
_SQRT2 = math.sqrt(2.0)

_BIOR_DYADIC = {
    # name: (dec_lo fractions, rec_lo fractions) — same length, zero-padded
    "bior1.1": ([1 / 2, 1 / 2], [1 / 2, 1 / 2]),
    "bior1.3": (
        [-1 / 16, 1 / 16, 1 / 2, 1 / 2, 1 / 16, -1 / 16],
        [0, 0, 1 / 2, 1 / 2, 0, 0],
    ),
    "bior1.5": (
        [3 / 256, -3 / 256, -11 / 128, 11 / 128, 1 / 2, 1 / 2,
         11 / 128, -11 / 128, -3 / 256, 3 / 256],
        [0, 0, 0, 0, 1 / 2, 1 / 2, 0, 0, 0, 0],
    ),
    "bior2.2": (
        [0, -1 / 8, 1 / 4, 3 / 4, 1 / 4, -1 / 8],
        [0, 1 / 4, 1 / 2, 1 / 4, 0, 0],
    ),
    "bior2.4": (
        [0, 3 / 128, -3 / 64, -1 / 8, 19 / 64, 45 / 64,
         19 / 64, -1 / 8, -3 / 64, 3 / 128],
        [0, 0, 0, 1 / 4, 1 / 2, 1 / 4, 0, 0, 0, 0],
    ),
    "bior2.6": (
        [0, -5 / 1024, 5 / 512, 17 / 512, -39 / 512, -123 / 1024, 81 / 256,
         175 / 256, 81 / 256, -123 / 1024, -39 / 512, 17 / 512, 5 / 512,
         -5 / 1024],
        [0, 0, 0, 0, 0, 1 / 4, 1 / 2, 1 / 4, 0, 0, 0, 0, 0, 0],
    ),
}

# CDF 9/7 (bior4.4) — irrational; standard published values (JPEG2000).
_BIOR44_DEC_LO = [
    0.0,
    0.03782845550726404,
    -0.023849465019556843,
    -0.11062440441843718,
    0.37740285561283066,
    0.8526986790088938,
    0.37740285561283066,
    -0.11062440441843718,
    -0.023849465019556843,
    0.03782845550726404,
]
_BIOR44_REC_LO = [
    0.0,
    -0.06453888262869706,
    -0.04068941760916406,
    0.41809227322161724,
    0.7884856164055829,
    0.41809227322161724,
    -0.04068941760916406,
    -0.06453888262869706,
    0.0,
    0.0,
]


# ---------------------------------------------------------------------------
# Wavelet object + registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Wavelet:
    """Analysis/synthesis filter quadruple (pywt-compatible orientation)."""

    name: str
    dec_lo: Tuple[float, ...]
    dec_hi: Tuple[float, ...]
    rec_lo: Tuple[float, ...]
    rec_hi: Tuple[float, ...]
    orthogonal: bool = True
    biorthogonal: bool = field(default=False)

    @property
    def dec_len(self) -> int:
        return len(self.dec_lo)

    @property
    def rec_len(self) -> int:
        return len(self.rec_lo)

    def filter_bank(self):
        return (self.dec_lo, self.dec_hi, self.rec_lo, self.rec_hi)


def _orthogonal_wavelet(name: str, rec_lo: Sequence[float]) -> Wavelet:
    rec_lo = np.asarray(rec_lo, dtype=np.float64)
    dec_lo = rec_lo[::-1]
    rec_hi = qmf(rec_lo)
    dec_hi = rec_hi[::-1]
    return Wavelet(
        name=name,
        dec_lo=tuple(dec_lo.tolist()),
        dec_hi=tuple(dec_hi.tolist()),
        rec_lo=tuple(rec_lo.tolist()),
        rec_hi=tuple(rec_hi.tolist()),
        orthogonal=True,
        biorthogonal=False,
    )


def _biorthogonal_wavelet(name: str, dec_lo, rec_lo) -> Wavelet:
    dec_lo = np.asarray(dec_lo, dtype=np.float64)
    rec_lo = np.asarray(rec_lo, dtype=np.float64)
    n = np.arange(len(dec_lo))
    dec_hi = ((-1.0) ** (n + 1)) * rec_lo
    rec_hi = ((-1.0) ** n) * dec_lo
    return Wavelet(
        name=name,
        dec_lo=tuple(dec_lo.tolist()),
        dec_hi=tuple(dec_hi.tolist()),
        rec_lo=tuple(rec_lo.tolist()),
        rec_hi=tuple(rec_hi.tolist()),
        orthogonal=False,
        biorthogonal=True,
    )


@functools.lru_cache(maxsize=None)
def get_wavelet(name) -> Wavelet:
    """Look a wavelet up by name ('haar', 'dbN', 'symN', 'biorX.Y')."""
    if isinstance(name, Wavelet):
        return name
    key = str(name).lower()
    if key == "haar":
        w = _orthogonal_wavelet("haar", daubechies_scaling_filter(1))
        return w
    if key.startswith("db"):
        N = int(key[2:])
        return _orthogonal_wavelet(key, daubechies_scaling_filter(N))
    if key.startswith("sym"):
        N = int(key[3:])
        return _orthogonal_wavelet(
            key, daubechies_scaling_filter(N, least_asymmetric=True)
        )
    if key.startswith("bior"):
        if key == "bior4.4":
            return _biorthogonal_wavelet(key, _BIOR44_DEC_LO, _BIOR44_REC_LO)
        if key in _BIOR_DYADIC:
            dec_fr, rec_fr = _BIOR_DYADIC[key]
            dec = [f * _SQRT2 for f in dec_fr]
            rec = [f * _SQRT2 for f in rec_fr]
            return _biorthogonal_wavelet(key, dec, rec)
        raise ValueError(f"Unsupported biorthogonal wavelet: {name}")
    if key.startswith("rbio"):
        # reverse biorthogonal: swap analysis/synthesis of the bior twin
        twin = get_wavelet("bior" + key[4:])
        return Wavelet(
            name=key,
            dec_lo=twin.rec_lo[::-1],
            dec_hi=twin.rec_hi[::-1],
            rec_lo=twin.dec_lo[::-1],
            rec_hi=twin.dec_hi[::-1],
            orthogonal=False,
            biorthogonal=True,
        )
    raise ValueError(f"Unknown wavelet: {name}")


def wavelist() -> Tuple[str, ...]:
    names = ["haar"]
    names += [f"db{i}" for i in range(1, 21)]
    names += [f"sym{i}" for i in range(2, 11)]
    names += sorted(_BIOR_DYADIC.keys()) + ["bior4.4"]
    names += ["rbio" + k[4:] for k in sorted(_BIOR_DYADIC.keys())] + ["rbio4.4"]
    return tuple(names)


def dwt_coeff_len(data_len: int, filter_len: int, mode: str = "symmetric") -> int:
    """Output length of a single-level DWT (pywt.dwt_coeff_len semantics).

    Used by the analysis filter bank to derive the pad amount, mirroring
    the reference `dwt/lowlevel.py:153-154`.
    """
    if isinstance(filter_len, Wavelet):
        filter_len = filter_len.dec_len
    if data_len < 1:
        raise ValueError("data_len must be >= 1")
    if mode in ("per", "periodization"):
        return (data_len + 1) // 2
    return (data_len + filter_len - 1) // 2
