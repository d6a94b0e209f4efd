"""SWT tests: analysis parity vs the reference afb1d_atrous math and
round-trip through our inverse (the reference ships no working
SWTInverse — dwt/swt_inverse.py is not importable, SURVEY §2b W3)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ficsr_tpu.wavelets.swt import SWTForward, SWTInverse, iswt2, swt2

from . import pywt_shim


def _ref_swt_level(x_np, wave, dilation):
    """Reference afb2d_atrous (lowlevel.py:475-521) on torch CPU.
    Returns (N, 4C, H, W) raw conv output; subband order per original
    channel c is [ll, lh, hl, hh] at stride 4c (rows filtered first,
    then columns interleave lo/hi)."""
    pywt_shim.install()
    import torch
    from pytorch_wavelets.dwt import lowlevel as ll

    h0, h1 = _filters(wave)
    # pass row filters explicitly: the reference prep_filt_afb2d has a
    # typo (`h0_row, h1_col = ...`, lowlevel.py:945) that leaves h1_row
    # None when defaulted
    filts = ll.prep_filt_afb2d(h0, h1, h0, h1)
    with torch.no_grad():
        y = ll.afb2d_atrous(torch.from_numpy(x_np), filts, "periodic",
                            dilation)
    return y.numpy()


def _filters(wave):
    from ficsr_tpu.wavelets.coeffs import get_wavelet

    w = get_wavelet(wave)
    return np.asarray(w.dec_lo), np.asarray(w.dec_hi)


@pytest.mark.parametrize("wave", ["haar", "db2"])
@pytest.mark.parametrize("dil", [1, 2])
def test_swt_level_parity_vs_reference(rng, wave, dil):
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    ref = _ref_swt_level(x, wave, dil)  # (1, 8, 32, 32)
    # our swt2 at the matching level
    level = 1 if dil == 1 else 2
    coeffs = swt2(jnp.asarray(x), wave, level=level, mode="periodic")
    got = np.asarray(coeffs[-1])  # (1, 2, 4, H, W)
    n, c4 = ref.shape[0], ref.shape[1]
    ref_r = ref.reshape(n, c4 // 4, 4, *ref.shape[2:])
    if dil == 1:
        np.testing.assert_allclose(got, ref_r, atol=2e-5)
    else:
        # level-2 reference input is our level-1 LL; recompute
        ll1 = np.asarray(coeffs[0][:, :, 0])
        ref2 = _ref_swt_level(ll1, wave, 2)
        ref2_r = ref2.reshape(n, c4 // 4, 4, *ref2.shape[2:])
        np.testing.assert_allclose(got, ref2_r, atol=2e-5)


@pytest.mark.parametrize("wave", ["haar", "db2", "db3", "bior2.2"])
def test_swt_roundtrip(rng, wave):
    x = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    coeffs = swt2(x, wave, level=2)
    y = iswt2(coeffs, wave)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_swt_shapes_undecimated(rng):
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    coeffs = SWTForward(J=3, wave="db2")(x)
    assert len(coeffs) == 3
    for c in coeffs:
        assert c.shape == (2, 3, 4, 64, 64)
    y = SWTInverse(wave="db2")(coeffs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
