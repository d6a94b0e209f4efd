"""W12 test-image utils: golden parity vs the reference's
drawedge/drawcirc (pytorch_wavelets/utils.py:45-99) + memoize."""

import numpy as np
import pytest

from ficsr_tpu.utils.testimg import drawcirc, drawedge, memoize

from . import pywt_shim


def _ref_utils():
    pywt_shim.install()
    import pytorch_wavelets.utils as u
    return u


@pytest.mark.parametrize("theta,r,w,n", [
    (0.0, (16, 16), 2.0, 32),
    (30.0, (10, 20), 4.0, 32),
    (115.0, (20, 12), 1.0, 31),
])
def test_drawedge_golden(theta, r, w, n):
    ref = _ref_utils().drawedge(theta, np.array(r), w, n)
    got = drawedge(theta, r, w, n)
    assert got.shape == ref.shape == (n, n)
    np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("r,w,du,dv,n", [
    (8.0, 2.0, 0.0, 0.0, 32),
    (5.0, 1.0, 3.0, -4.0, 33),
    (12.0, 6.0, -2.0, 1.0, 32),
])
def test_drawcirc_golden(r, w, du, dv, n):
    ref = _ref_utils().drawcirc(r, w, du, dv, n)
    got = drawcirc(r, w, du, dv, n)
    assert got.shape == ref.shape == (n, n)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_memoize():
    calls = []

    @memoize
    def f(a, b=1):
        calls.append((a, b))
        return a + b

    assert f(1) == 2 and f(1) == 2
    assert calls == [(1, 1)]          # cached on positional args
    assert f(2) == 3 and len(calls) == 2
    assert f(1, b=5) == 2             # kwargs ignored in key (reference quirk)
