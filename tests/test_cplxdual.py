"""Complex dual-tree transform (reference lowlevel2.cplxdual2D — the
W10 'alternative DTCWT').  Forward parity vs the reference (which runs);
inverse is round-trip verified only — the reference's icplxdual2D is
unrunnable (sfb2d signature bug at lowlevel2.py:570) and its 45/135
unpack is crossed."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ficsr_tpu.wavelets.dtcwt.cplxdual import cplxdual2d, icplxdual2d

from . import pywt_shim


def _ref_cplxdual(x_np, J):
    pywt_shim.install()
    from pytorch_wavelets.dtcwt import lowlevel2 as L2

    with torch.no_grad():
        lows, yh = L2.cplxdual2D(torch.from_numpy(x_np), J=J)
    return ([[t.numpy() for t in row] for row in lows],
            [h.numpy() for h in yh])


@pytest.mark.parametrize("J", [1, 2])
def test_forward_parity(rng, J):
    x = rng.randn(1, 2, 64, 64).astype(np.float32)
    lows_ref, yh_ref = _ref_cplxdual(x, J)
    lows, yh = cplxdual2d(jnp.asarray(x), J=J)
    for m in range(2):
        for n in range(2):
            np.testing.assert_allclose(
                np.asarray(lows[m][n]), lows_ref[m][n], atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


@pytest.mark.parametrize("J", [1, 3])
def test_roundtrip(rng, J):
    x = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    lows, yh = cplxdual2d(x, J=J)
    xr = icplxdual2d(lows, yh)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_magnitude_mode(rng):
    x = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    _, yh = cplxdual2d(x, J=1, mag=True)
    assert yh[0].shape == (1, 6, 1, 16, 16)
    assert float(yh[0].min()) >= -1e-6  # magnitudes are non-negative
