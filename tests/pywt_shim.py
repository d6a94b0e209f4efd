"""Minimal pywt stand-in so the *reference* pytorch_wavelets can run.

PyWavelets is not installed in this image.  The vendored reference
library only uses three pywt symbols (`Wavelet`, `dwt_coeff_len`, and
implicitly the filter-bank attributes), so for golden-parity tests we
inject this shim as ``sys.modules['pywt']`` before importing the
read-only reference from /root/reference.  The shim is backed by OUR
coefficient tables, which are independently validated against published
Daubechies/CDF digits in test_coeffs.py — so parity tests still check
the transform machinery, not a shared coefficient bug... the
coefficients themselves are checked against external golden digits.
"""

import sys
import types

from ficsr_tpu.wavelets import coeffs as _c


class Wavelet:
    def __init__(self, name):
        w = _c.get_wavelet(name)
        self.name = w.name
        self.dec_lo = list(w.dec_lo)
        self.dec_hi = list(w.dec_hi)
        self.rec_lo = list(w.rec_lo)
        self.rec_hi = list(w.rec_hi)
        self.dec_len = w.dec_len
        self.rec_len = w.rec_len


def dwt_coeff_len(data_len, filter_len, mode="symmetric"):
    if isinstance(filter_len, Wavelet):
        filter_len = filter_len.dec_len
    return _c.dwt_coeff_len(data_len, filter_len, mode)


def wavelist(family=None):
    return list(_c.wavelist())


def _pkg_resources_shim():
    """`pkg_resources` was dropped from modern setuptools; the reference
    dtcwt coeff loader needs `resource_stream` only."""
    import importlib
    import os

    mod = types.ModuleType("pkg_resources")

    def resource_stream(package, resource):
        pkg = importlib.import_module(package)
        base = os.path.dirname(pkg.__file__)
        return open(os.path.join(base, resource), "rb")

    mod.resource_stream = resource_stream
    return mod


def install():
    """Register the shims and put the reference tree on sys.path
    (skips the calling test when the reference tree is absent)."""
    import os
    try:
        from . import ref_shims
    except ImportError:  # imported as a top-level module (benchmarks/)
        import ref_shims
    ref_shims.require_reference()
    if "pywt" not in sys.modules:
        mod = types.ModuleType("pywt")
        mod.Wavelet = Wavelet
        mod.dwt_coeff_len = dwt_coeff_len
        mod.wavelist = wavelist
        sys.modules["pywt"] = mod
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            sys.modules["pkg_resources"] = _pkg_resources_shim()
    ref = os.path.join(ref_shims.REFERENCE_ROOT, "pytorch_wavelets")
    if ref not in sys.path:
        sys.path.insert(0, ref)
