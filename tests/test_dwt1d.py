"""1-D DWT parity grid vs the executing reference
(`/root/reference/pytorch_wavelets/tests/test_dwt1d.py:40-151` matrix:
modes × db1..db4/bior2.4 × even/odd lengths, fwd + inverse + gradient).

The reference's own 1-D suite compares against PyWavelets; here the
golden is the reference pytorch_wavelets itself running on torch-CPU
through tests/pywt_shim (whose coefficient tables are independently
pinned against published digits in test_coeffs.py), so these tests
check the transform machinery end to end.  One representative case
stays in the fast set (tests/test_dwt.py::test_dwt1d_roundtrip_and_
parity); the full grid is slow-marked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import pywt_shim
from ficsr_tpu.wavelets.transform1d import wavedec1, waverec1

MODES = ["zero", "symmetric", "reflect", "periodization", "periodic"]
WAVES = ["db1", "db2", "db3", "db4", "bior2.4"]
LENGTHS = [100, 101]        # even + odd (reference tests odd sizes too)


def _ref_xfms(J, wave, mode):
    pywt_shim.install()
    from pytorch_wavelets.dwt.transform1d import DWT1DForward, DWT1DInverse

    return DWT1DForward(J=J, wave=wave, mode=mode), \
        DWT1DInverse(wave=wave, mode=mode)


@pytest.mark.slow
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("wave", WAVES)
@pytest.mark.parametrize("length", LENGTHS)
def test_dwt1d_forward_parity_grid(rng, mode, wave, length):
    import torch

    x = rng.randn(2, 3, length).astype(np.float32)
    J = 2
    lo, yh = wavedec1(jnp.asarray(x), wave, mode, level=J)
    xfm, _ = _ref_xfms(J, wave, mode)
    with torch.no_grad():
        lo_ref, yh_ref = xfm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(lo), lo_ref.numpy(), atol=3e-5)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=3e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("wave", ["db2", "bior2.4"])
@pytest.mark.parametrize("length", LENGTHS)
def test_dwt1d_inverse_parity_and_roundtrip(rng, mode, wave, length):
    import torch

    x = rng.randn(2, 2, length).astype(np.float32)
    J = 2
    coeffs = wavedec1(jnp.asarray(x), wave, mode, level=J)
    y = waverec1(coeffs, wave, mode)
    # round-trip (reference test_dwt1d ok() equivalent)
    np.testing.assert_allclose(np.asarray(y)[..., :length], x, atol=1e-4)
    # inverse parity: feed the REFERENCE's coefficients through both
    xfm, ifm = _ref_xfms(J, wave, mode)
    with torch.no_grad():
        lo_ref, yh_ref = xfm(torch.from_numpy(x))
        y_ref = ifm((lo_ref, yh_ref))
    ours = waverec1((jnp.asarray(lo_ref.numpy()),
                     [jnp.asarray(h.numpy()) for h in yh_ref]), wave, mode)
    np.testing.assert_allclose(np.asarray(ours), y_ref.numpy(), atol=3e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zero", "symmetric", "reflect",
                                  "periodization"])
@pytest.mark.parametrize("wave", ["db1", "db3"])
def test_dwt1d_gradient_parity_grid(rng, mode, wave):
    """Analytic-adjoint VJP vs torch autograd through the reference
    (reference test_dwt1d gradient tests; our custom_vjp mirrors
    AFB1D/SFB1D.backward, dwt/lowlevel.py:368-424,697-743)."""
    import torch

    x = rng.randn(1, 2, 100).astype(np.float32)
    ct_seed = rng.randn(7).astype(np.float32)  # projection weights

    def scalar_jax(xj):
        lo, yh = wavedec1(xj, wave, mode, level=2)
        s = ct_seed[0] * jnp.sum(lo * jnp.cos(jnp.arange(lo.shape[-1])))
        for i, h in enumerate(yh):
            s = s + ct_seed[i + 1] * jnp.sum(
                h * jnp.sin(jnp.arange(h.shape[-1]) + i))
        return s

    g_jax = jax.grad(scalar_jax)(jnp.asarray(x))

    xfm, _ = _ref_xfms(2, wave, mode)
    xt = torch.from_numpy(x).requires_grad_(True)
    lo, yh = xfm(xt)
    s = ct_seed[0] * torch.sum(
        lo * torch.cos(torch.arange(lo.shape[-1], dtype=torch.float32)))
    for i, h in enumerate(yh):
        s = s + float(ct_seed[i + 1]) * torch.sum(
            h * torch.sin(torch.arange(h.shape[-1], dtype=torch.float32) + i))
    s.backward()
    np.testing.assert_allclose(np.asarray(g_jax), xt.grad.numpy(),
                               atol=5e-4)


def test_dwt1d_none_highs_matches_reference(rng):
    """waverec1 zero-fills None highpasses exactly like the reference
    DWT1DInverse (dwt/transform1d.py:85-110): zeros take ll's own
    length, so odd-size crop decisions drift identically too."""
    import torch

    x = rng.randn(1, 1, 101).astype(np.float32)
    lo, yh = wavedec1(jnp.asarray(x), "db2", "symmetric", level=3)
    y_nohi = waverec1((lo, [None] * len(yh)), "db2", "symmetric")
    _, ifm = _ref_xfms(3, "db2", "symmetric")
    with torch.no_grad():
        y_ref = ifm((torch.from_numpy(np.asarray(lo)), [None] * len(yh)))
    assert y_nohi.shape == tuple(y_ref.shape)
    np.testing.assert_allclose(np.asarray(y_nohi), y_ref.numpy(),
                               atol=3e-5)
