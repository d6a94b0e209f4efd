"""Quad-filter DTCWT (SURVEY §2b W10, reference dtcwt/lowlevel2.py
DTCWTForward2/Inverse2 + quad_afb2d) — golden parity vs the reference
torch implementation and round-trip reconstruction."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from ficsr_tpu.wavelets.dtcwt.quad import (
    DTCWTForward2,
    DTCWTInverse2,
    quad_afb2d,
    quad_afb2d_nonsep,
)

from . import pywt_shim


def _ref_lowlevel2():
    pywt_shim.install()
    from pytorch_wavelets.dtcwt import lowlevel2
    return lowlevel2


@pytest.mark.parametrize("J", [1, 3])
def test_forward2_parity(rng, J):
    ref = _ref_lowlevel2()
    x = rng.randn(2, 2, 64, 64).astype(np.float32)
    with torch.no_grad():
        lows_ref, yh_ref = ref.DTCWTForward2(J=J)(torch.from_numpy(x))
    lows, yh = DTCWTForward2(J=J)(jnp.asarray(x))
    for m in range(2):
        for n in range(2):
            np.testing.assert_allclose(
                np.asarray(lows[m][n]), lows_ref[m][n].numpy(), atol=1e-5)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-5)


def test_inverse2_parity(rng):
    ref = _ref_lowlevel2()
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    with torch.no_grad():
        lows_ref, yh_ref = ref.DTCWTForward2(J=2)(torch.from_numpy(x))
        rec_ref = ref.DTCWTInverse2()((lows_ref, yh_ref))
    lows = [[jnp.asarray(lows_ref[m][n].numpy()) for n in range(2)]
            for m in range(2)]
    yh = [jnp.asarray(h.numpy()) for h in yh_ref]
    # ref_band_swap reproduces the reference's LH/HL inverse-mapping bug
    # (its own round-trip error is ~4.0; see quad._unstack_orientations)
    rec = DTCWTInverse2(ref_band_swap=True)((lows, yh))
    np.testing.assert_allclose(np.asarray(rec), rec_ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("J", [1, 2])
def test_forward2_inverse2_roundtrip(rng, J):
    """farras level-1 + qshift_a quads give perfect reconstruction."""
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    coeffs = DTCWTForward2(J=J)(jnp.asarray(x))
    rec = DTCWTInverse2()(coeffs)
    np.testing.assert_allclose(np.asarray(rec), x, atol=1e-5)


@pytest.mark.parametrize("mode", ["zero", "symmetric", "periodization"])
def test_quad_afb2d_parity(rng, mode):
    ref = _ref_lowlevel2()
    pywt_shim.install()
    from pytorch_wavelets.dtcwt.coeffs import level1

    h0a, h0b, _, _, h1a, h1b, _, _ = level1("farras")
    cols, rows = ref.prep_filt_quad_afb2d(h0a, h1a, h0b, h1b)
    x = rng.randn(2, 2, 32, 32).astype(np.float32)
    with torch.no_grad():
        yl_ref, yh_ref = ref.quad_afb2d(torch.from_numpy(x), cols, rows,
                                        mode=mode)
    yl, yh = quad_afb2d(jnp.asarray(x), h0a, h1a, h0b, h1b, mode=mode)
    np.testing.assert_allclose(np.asarray(yl), yl_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yh), yh_ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("mode", ["zero", "symmetric", "periodization"])
def test_quad_afb2d_nonsep_parity(rng, mode):
    """Non-separable single-conv packing vs the reference
    (quad_afb2d_nonsep, lowlevel2.py:374-443) on one DWT tree's four
    2-D point-spread kernels."""
    ref = _ref_lowlevel2()
    pywt_shim.install()
    from pytorch_wavelets.dtcwt.coeffs import level1

    h0a, h0b, _, _, h1a, h1b, _, _ = level1("farras")
    filts = ref.prep_filt_quad_afb2d_nonsep(
        h0a, h1a, h0a, h1a, h0b, h1b, h0b, h1b,
        h0a, h1a, h0a, h1a, h0b, h1b, h0b, h1b)
    # reference reshape assumes 4 filters/channel; feed one tree's quad
    tree = filts[[0, 4, 8, 12]]
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    with torch.no_grad():
        yl_ref, yh_ref = ref.quad_afb2d_nonsep(torch.from_numpy(x), tree,
                                               mode=mode)
    yl, yh = quad_afb2d_nonsep(jnp.asarray(x), tree.numpy(), mode=mode)
    np.testing.assert_allclose(np.asarray(yl), yl_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yh), yh_ref.numpy(), atol=1e-5)
