"""DTCWT coefficient lookup (reference `dtcwt/coeffs.py:17-123`).

Same API shape: `level1(name, compact)` / `biort(name)` returns the
first-level biorthogonal filters, `qshift(name)` the quarter-shift
bank.  Backed by the embedded data module instead of .npz resources.
"""

from __future__ import annotations

from ficsr_tpu.wavelets.dtcwt import data as _data

__all__ = ["biort", "level1", "qshift"]


def level1(name: str, compact: bool = False):
    """Level-1 filters by name: antonini, farras, legall, near_sym_a,
    near_sym_b, near_sym_a2, near_sym_b_bp."""
    if compact:
        if name.endswith("_bp"):
            return _data.get(name, "h0o", "g0o", "h1o", "g1o", "h2o", "g2o")
        return _data.get(name, "h0o", "g0o", "h1o", "g1o")
    return _data.get(name, "h0a", "h0b", "g0a", "g0b", "h1a", "h1b",
                     "g1a", "g1b")


def biort(name: str):
    return level1(name, compact=True)


def qshift(name: str):
    """Quarter-shift filters: qshift_06/32/a/b/c/d, qshift_b_bp."""
    if name.endswith("_bp"):
        return _data.get(name, "h0a", "h0b", "g0a", "g0b", "h1a", "h1b",
                         "g1a", "g1b", "h2a", "h2b", "g2a", "g2b")
    return _data.get(name, "h0a", "h0b", "g0a", "g0b", "h1a", "h1b",
                     "g1a", "g1b")
