"""2-D/1-D DWT tests, following the reference test strategy
(`/root/reference/pytorch_wavelets/tests/test_dwt.py`, SURVEY.md §4):

  1. golden parity vs the *reference torch implementation* run in-process
     (read-only import from /root/reference, pywt shimmed),
  2. round-trip reconstruction,
  3. analytic-adjoint gradients (backward == inverse with same filters),
  4. odd/even shape handling.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets import (
    DWTForward,
    DWTInverse,
    dwt1,
    dwt2,
    idwt1,
    idwt2,
    wavedec1,
    wavedec2,
    waverec1,
    waverec2,
)

from . import pywt_shim

WAVES = ["haar", "db2", "db3", "bior2.4"]
MODES = ["zero", "symmetric", "reflect", "periodization", "periodic"]


def _ref_dwt(x_np, wave, mode, J):
    """Run the reference pytorch_wavelets DWTForward on CPU torch."""
    pywt_shim.install()
    import torch
    from pytorch_wavelets.dwt.transform2d import DWTForward as RefDWT

    xfm = RefDWT(J=J, wave=wave, mode=mode)
    with torch.no_grad():
        yl, yh = xfm(torch.from_numpy(x_np))
    return yl.numpy(), [h.numpy() for h in yh]


def _ref_idwt(yl, yh, wave, mode):
    pywt_shim.install()
    import torch
    from pytorch_wavelets.dwt.transform2d import DWTInverse as RefIDWT

    ifm = RefIDWT(wave=wave, mode=mode)
    with torch.no_grad():
        y = ifm((torch.from_numpy(yl), [torch.from_numpy(h) for h in yh]))
    return y.numpy()


@pytest.mark.parametrize("wave", WAVES)
@pytest.mark.parametrize("mode", MODES)
def test_parity_vs_reference_even(rng, wave, mode):
    x = rng.randn(2, 2, 32, 32).astype(np.float32)
    yl_ref, yh_ref = _ref_dwt(x, wave, mode, J=2)
    yl, yh = wavedec2(jnp.asarray(x), wave, mode, level=2)
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=2e-5)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-5)


@pytest.mark.parametrize("shape", [(31, 31), (30, 31), (31, 30), (25, 26)])
@pytest.mark.parametrize("mode", ["zero", "reflect", "periodization"])
def test_parity_vs_reference_odd_shapes(rng, shape, mode):
    x = rng.randn(1, 1, *shape).astype(np.float32)
    yl_ref, yh_ref = _ref_dwt(x, "db2", mode, J=2)
    yl, yh = wavedec2(jnp.asarray(x), "db2", mode, level=2)
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=2e-5)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-5)


@pytest.mark.parametrize("mode", MODES)
def test_inverse_parity_vs_reference(rng, mode):
    x = rng.randn(1, 2, 24, 24).astype(np.float32)
    yl, yh = wavedec2(jnp.asarray(x), "db2", mode, level=2)
    yl_np = np.asarray(yl)
    yh_np = [np.asarray(h) for h in yh]
    y_ref = _ref_idwt(yl_np, yh_np, "db2", mode)
    y = waverec2((jnp.asarray(yl_np), [jnp.asarray(h) for h in yh_np]),
                 "db2", mode)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)


def test_haar_reflect_bitcomparable(rng):
    """BASELINE north star: bit-comparable Haar subbands vs reference.

    The Haar J=1 reflect transform on even sizes is the exact op the
    frequency discriminators consume (`model.py:140,190`).  'Bit
    comparable' here = identical up to float32 associativity (<= 1 ulp
    of the subband magnitudes).
    """
    x = rng.randn(1, 1, 256, 256).astype(np.float32)
    yl_ref, yh_ref = _ref_dwt(x, "haar", "reflect", J=1)
    yl, yh = wavedec2(jnp.asarray(x), "haar", "reflect", level=1)
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yh[0]), yh_ref[0], atol=1e-6)


@pytest.mark.parametrize("wave", WAVES)
@pytest.mark.parametrize("mode", ["reflect", "periodization"])
def test_roundtrip(rng, wave, mode):
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    coeffs = wavedec2(jnp.asarray(x), wave, mode, level=3)
    y = waverec2(coeffs, wave, mode)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_roundtrip_odd(rng):
    x = rng.randn(1, 1, 63, 61).astype(np.float32)
    coeffs = wavedec2(jnp.asarray(x), "db2", "reflect", level=2)
    y = waverec2(coeffs, "db2", "reflect")
    np.testing.assert_allclose(np.asarray(y)[..., :63, :61], x, atol=1e-5)


def test_none_highs_are_zero_filled(rng):
    x = rng.randn(1, 1, 32, 32).astype(np.float32)
    yl, yh = wavedec2(jnp.asarray(x), "haar", "zero", level=2)
    y = waverec2((yl, [None, yh[1]]), "haar", "zero")
    yz = waverec2((yl, [jnp.zeros_like(yh[0]), yh[1]]), "haar", "zero")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yz), atol=1e-7)


@pytest.mark.parametrize("wave", ["haar", "db2"])
@pytest.mark.parametrize("mode", ["zero", "reflect"])
def test_analysis_gradient_is_synthesis(rng, wave, mode):
    """Reference property (`tests/test_dwt.py:200-299`): the VJP of the
    forward DWT equals one level of synthesis with the analysis filters."""
    from ficsr_tpu.wavelets.lowlevel import _analysis_filters, sfb1d

    x = jnp.asarray(rng.randn(1, 2, 32, 32).astype(np.float32))
    (ll, hs), vjp = jax.vjp(lambda v: dwt2(v, wave, mode), x)
    ct_ll = jnp.asarray(rng.randn(*ll.shape).astype(np.float32))
    ct_h = jnp.asarray(rng.randn(*hs.shape).astype(np.float32))
    (dx,) = vjp((ct_ll, ct_h))

    h0, h1 = _analysis_filters(wave)
    lo = sfb1d(ct_ll, ct_h[:, :, 0], h0, h1, mode=mode, axis=2)
    hi = sfb1d(ct_h[:, :, 1], ct_h[:, :, 2], h0, h1, mode=mode, axis=2)
    expected = sfb1d(lo, hi, h0, h1, mode=mode, axis=3)[:, :, :32, :32]
    np.testing.assert_allclose(np.asarray(dx), np.asarray(expected), atol=1e-5)


def test_idwt_gradient_is_analysis(rng):
    from ficsr_tpu.wavelets.lowlevel import _synthesis_filters, afb1d

    ll = jnp.asarray(rng.randn(1, 1, 16, 16).astype(np.float32))
    hs = jnp.asarray(rng.randn(1, 1, 3, 16, 16).astype(np.float32))

    y, vjp = jax.vjp(lambda a, b: idwt2(a, b, "db2", "zero"), ll, hs)
    ct = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    d_ll, d_hs = vjp(ct)

    g0, g1 = _synthesis_filters("db2")
    lo_r, hi_r = afb1d(ct, g0, g1, mode="zero", axis=3)
    e_ll, e_lh = afb1d(lo_r, g0, g1, mode="zero", axis=2)
    e_hl, e_hh = afb1d(hi_r, g0, g1, mode="zero", axis=2)
    np.testing.assert_allclose(np.asarray(d_ll), np.asarray(e_ll)[:, :, :16, :16],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_hs[:, :, 0]),
                               np.asarray(e_lh)[:, :, :16, :16], atol=1e-5)


def test_gradcheck_roundtrip_linearity(rng):
    """Orthogonal haar: grad of 0.5*||dwt(x)||^2 must equal x itself."""
    x = jnp.asarray(rng.randn(1, 1, 16, 16).astype(np.float32))

    def energy(v):
        ll, yh = wavedec2(v, "haar", "zero", level=2)
        return 0.5 * (jnp.sum(ll ** 2) + sum(jnp.sum(h ** 2) for h in yh))

    g = jax.grad(energy)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x), atol=1e-5)


def test_dwt1d_roundtrip_and_parity(rng):
    x = rng.randn(2, 3, 100).astype(np.float32)
    lo, yh = wavedec1(jnp.asarray(x), "db2", "reflect", level=2)
    y = waverec1((lo, yh), "db2", "reflect")
    np.testing.assert_allclose(np.asarray(y)[..., :100], x, atol=1e-5)

    # parity vs reference 1D
    pywt_shim.install()
    import torch
    from pytorch_wavelets.dwt.transform1d import DWT1DForward

    xfm = DWT1DForward(J=2, wave="db2", mode="reflect")
    with torch.no_grad():
        lo_ref, yh_ref = xfm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(lo), lo_ref.numpy(), atol=2e-5)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-5)


def test_class_wrappers(rng):
    x = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    xfm = DWTForward(J=2, wave="haar", mode="reflect")
    ifm = DWTInverse(wave="haar", mode="reflect")
    yl, yh = xfm(x)
    assert yl.shape == (1, 1, 16, 16)
    assert yh[0].shape == (1, 1, 3, 32, 32)
    y = ifm((yl, yh))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_jit_and_vmap_compose(rng):
    x = jnp.asarray(rng.randn(4, 1, 32, 32).astype(np.float32))
    f = jax.jit(lambda v: dwt2(v, "haar", "reflect"))
    ll, hs = f(x)
    assert ll.shape == (4, 1, 16, 16)
    # vmap over an extra leading axis
    xx = jnp.stack([x, x])
    ll2, hs2 = jax.vmap(f)(xx)
    np.testing.assert_allclose(np.asarray(ll2[0]), np.asarray(ll), atol=1e-6)


@pytest.mark.parametrize("wave", ["sym4", "sym6", "rbio2.2", "bior1.3",
                                  "db6", "db8", "coif2", "coif5"])
def test_extended_wavelet_families_roundtrip(rng, wave):
    """Wider family coverage: symlets (least-asymmetric factorization),
    reverse biorthogonal, higher-order Daubechies, coiflets."""
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    coeffs = wavedec2(jnp.asarray(x), wave, "periodization", level=2)
    y = waverec2(coeffs, wave, "periodization")
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-5)


@pytest.mark.parametrize("wave", ["coif7", "coif17"])
def test_high_order_coiflet_roundtrip(rng, wave):
    """coif6..coif17 (generated, no published table) driven through the
    2-D DWT engine.  Sizes keep every level's band longer than the
    filter (102 taps at coif17) — the filter>signal case is rejected by
    the reference engine too."""
    x = rng.randn(1, 1, 256, 256).astype(np.float32)
    coeffs = wavedec2(jnp.asarray(x), wave, "periodization", level=1)
    y = waverec2(coeffs, wave, "periodization")
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-5)
