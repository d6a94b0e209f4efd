"""Non-separable 2-D filter-bank alternates: golden parity vs the
reference `afb2d_nonsep`/`sfb2d_nonsep` (dwt/lowlevel.py:524-597,
746-798) run in-process on torch CPU, plus consistency with our
separable dwt2 path (band order ll, lh, hl, hh)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ficsr_tpu.wavelets.coeffs import get_wavelet
from ficsr_tpu.wavelets.lowlevel import afb2d_nonsep, sfb2d_nonsep

from . import pywt_shim

MODES = ("zero", "symmetric", "reflect", "periodization")
SHAPES = ((1, 2, 16, 16), (2, 1, 15, 13))


def _ref_lowlevel():
    pywt_shim.install()
    from pytorch_wavelets.dwt import lowlevel as ll
    return ll


def _filters(wave):
    w = get_wavelet(wave)
    return (np.asarray(w.dec_lo, np.float32),
            np.asarray(w.dec_hi, np.float32),
            np.asarray(w.rec_lo, np.float32),
            np.asarray(w.rec_hi, np.float32))


@pytest.mark.parametrize("wave", ["haar", "db2"])
@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("shape", SHAPES)
def test_afb2d_nonsep_golden(rng, wave, mode, shape):
    import torch
    ll = _ref_lowlevel()
    h0, h1, _, _ = _filters(wave)
    x = rng.standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        ref = ll.afb2d_nonsep(torch.from_numpy(x), [h0, h1],
                              mode=mode).numpy()
    # the reference returns flat (N, 4C, H', W') — groups=C with the
    # 4-filter stack repeated per channel, so channel-major band blocks
    ref = ref.reshape(ref.shape[0], -1, 4, *ref.shape[-2:])
    got = np.asarray(afb2d_nonsep(jnp.asarray(x), wave, mode=mode))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("wave", ["haar", "db2"])
@pytest.mark.parametrize("mode", MODES)
def test_sfb2d_nonsep_golden(rng, wave, mode):
    import torch
    ll = _ref_lowlevel()
    _, _, g0, g1 = _filters(wave)
    coeffs = rng.standard_normal((2, 3, 4, 8, 9)).astype(np.float32)
    with torch.no_grad():
        ref = ll.sfb2d_nonsep(torch.from_numpy(coeffs), [g0, g1],
                              mode=mode).numpy()
    got = np.asarray(sfb2d_nonsep(jnp.asarray(coeffs), wave, mode=mode))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", MODES)
def test_nonsep_matches_separable(rng, mode):
    """Same subbands as the separable path (our dwt2, J=1)."""
    from ficsr_tpu.wavelets.transform2d import dwt2

    x = jnp.asarray(rng.standard_normal((1, 2, 16, 16)), jnp.float32)
    ll_sep, highs = dwt2(x, "db2", mode=mode)
    y = afb2d_nonsep(x, "db2", mode=mode)
    np.testing.assert_allclose(np.asarray(y[:, :, 0]), np.asarray(ll_sep),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y[:, :, 1:]), np.asarray(highs),
                               atol=1e-5, rtol=1e-5)


def test_nonsep_roundtrip_periodization(rng):
    """per-mode analysis -> synthesis reconstructs exactly (even size)."""
    x = jnp.asarray(rng.standard_normal((1, 1, 16, 16)), jnp.float32)
    y = afb2d_nonsep(x, "db2", mode="periodization")
    rec = sfb2d_nonsep(y, "db2", mode="periodization")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               atol=1e-5, rtol=1e-5)
