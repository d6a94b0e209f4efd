"""Transform parity on a natural-image-like fixture (VERDICT r4
missing #4).

The reference's DTCWT/filter tests run on real photographs
(barbara/mandrill `.npz`, `pytorch_wavelets/tests/test_dtcwt.py:31-44`);
everything in this suite so far used synthetic random arrays.  These
tests close that gap with `utils.testimg.natural_image` — a
deterministic composite with photograph-like statistics (oriented
edges, curved contours, 1/f texture, smooth illumination) — and re-run
the headline golden-parity checks on it: DWT, DTCWT, ScatterNet vs the
reference torch implementation in-process, plus round-trips.

Linear transforms make input-distribution bugs unlikely, but the
reference's own suite treats real-image content as a distinct test
axis (boundary-dominated subbands, non-zero-mean channels, energy at
every orientation), so we do too.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ficsr_tpu.utils.testimg import natural_image

from . import pywt_shim  # noqa: F401  (installed by the _ref helpers)
from .test_dtcwt import _ref_dtcwt, _ref_idtcwt
from .test_dwt import _ref_dwt
from .test_scatternet import _ref_scat


@pytest.fixture(scope="module")
def img():
    """(1, 3, 256, 256) float32 in [0, 1] — barbara-shaped, generated."""
    return natural_image(N=256, channels=3)[None]


def test_fixture_is_imagelike(img):
    x = img[0]
    assert x.shape == (3, 256, 256) and x.dtype == np.float32
    assert x.min() >= 0.0 and x.max() <= 1.0
    # deterministic across calls (bit-stable fixture contract)
    np.testing.assert_array_equal(x, natural_image(N=256, channels=3))
    # photograph-like statistics: non-zero mean, energy both below and
    # above the N/8 radial frequency (smooth regions AND edges/texture),
    # channels correlated-but-distinct like RGB planes
    f = np.fft.fftshift(np.abs(np.fft.fft2(x[0] - x[0].mean())) ** 2)
    N = f.shape[0]
    fy, fx = np.ogrid[-N // 2:N // 2, -N // 2:N // 2]
    hi = f[np.hypot(fy, fx) > N / 8].sum() / f.sum()
    assert 0.001 < hi < 0.9, hi
    c01 = np.corrcoef(x[0].ravel(), x[1].ravel())[0, 1]
    assert 0.2 < c01 < 0.999, c01


@pytest.mark.parametrize("wave,mode", [
    ("haar", "reflect"),          # the discriminators' configuration
    ("db2", "symmetric"),
    ("bior2.4", "periodization"),
])
def test_dwt_parity_on_natural_image(img, wave, mode):
    from ficsr_tpu.wavelets import wavedec2

    yl_ref, yh_ref = _ref_dwt(img, wave, mode, J=3)
    yl, yh = wavedec2(jnp.asarray(img), wave=wave, mode=mode, level=3)
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=2e-5)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-5)


def test_dwt_roundtrip_on_natural_image(img):
    from ficsr_tpu.wavelets import wavedec2, waverec2

    yl, yh = wavedec2(jnp.asarray(img), wave="db3", mode="symmetric", level=4)
    rec = waverec2((yl, yh), wave="db3", mode="symmetric")
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-5)


def test_dtcwt_parity_on_natural_image(img):
    from ficsr_tpu.wavelets.dtcwt import DTCWTForward

    yl_ref, yh_ref = _ref_dtcwt(img, J=3)
    yl, yh = DTCWTForward(J=3)(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


def test_dtcwt_roundtrip_on_natural_image(img):
    from ficsr_tpu.wavelets.dtcwt import DTCWTForward, DTCWTInverse

    yl, yh = DTCWTForward(J=3, biort="near_sym_b", qshift="qshift_b")(
        jnp.asarray(img))
    rec = DTCWTInverse(biort="near_sym_b", qshift="qshift_b")((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-4)
    # and the reference inverse agrees on our coefficients
    rec_ref = _ref_idtcwt(np.asarray(yl), [np.asarray(h) for h in yh],
                          biort="near_sym_b", qshift="qshift_b")
    np.testing.assert_allclose(np.asarray(rec), rec_ref, atol=1e-4)


def test_scatternet_parity_on_natural_image(img):
    from ficsr_tpu.wavelets.scatternet import ScatLayer

    x = img[:, :, ::4, ::4]  # 64² keeps the j1 scattering quick on CPU
    ref = _ref_scat(x, "ScatLayer")
    got = np.asarray(ScatLayer()(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_discriminator_dwt_branch_on_natural_image(img):
    """The exact subband path the FS discriminators consume
    (reference model.py:166-172): haar J=1 reflect on image-range data,
    LL vs reference, renormalized highs vs reference."""
    from ficsr_tpu.wavelets import DWTForward

    x = (img[:, :1] * 2.0 - 1.0).astype(np.float32)  # [-1,1] like tanh out
    yl_ref, yh_ref = _ref_dwt(x, "haar", "reflect", J=1)
    yl, yh = DWTForward(J=1, wave="haar", mode="reflect")(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yh[0]) * 0.5 + 0.5,
                               yh_ref[0] * 0.5 + 0.5, atol=1e-5)
