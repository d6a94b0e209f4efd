"""DTCWT golden parity vs the reference torch implementation
(reference test strategy: `pytorch_wavelets/tests/test_dtcwt.py`)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ficsr_tpu.wavelets.dtcwt import DTCWTForward, DTCWTInverse

from . import pywt_shim


def _ref_dtcwt(x_np, J=3, biort="near_sym_a", qshift="qshift_a",
               skip_hps=False, include_scale=False, o_dim=2, ri_dim=-1):
    pywt_shim.install()
    from pytorch_wavelets.dtcwt.transform2d import DTCWTForward as Ref

    xfm = Ref(biort=biort, qshift=qshift, J=J, skip_hps=skip_hps,
              include_scale=include_scale, o_dim=o_dim, ri_dim=ri_dim)
    with torch.no_grad():
        yl, yh = xfm(torch.from_numpy(x_np))
    if include_scale:
        return [s.numpy() for s in yl], [h.numpy() for h in yh]
    return yl.numpy(), [h.numpy() for h in yh]


def _ref_idtcwt(yl, yh, biort="near_sym_a", qshift="qshift_a"):
    pywt_shim.install()
    from pytorch_wavelets.dtcwt.transform2d import DTCWTInverse as Ref

    ifm = Ref(biort=biort, qshift=qshift)
    with torch.no_grad():
        y = ifm((torch.from_numpy(yl), [torch.from_numpy(h) for h in yh]))
    return y.numpy()


@pytest.mark.parametrize("biort,qshift", [
    ("near_sym_a", "qshift_a"),
    ("near_sym_b", "qshift_b"),
    ("legall", "qshift_06"),
])
def test_forward_parity(rng, biort, qshift):
    x = rng.randn(1, 2, 64, 64).astype(np.float32)
    yl_ref, yh_ref = _ref_dtcwt(x, J=3, biort=biort, qshift=qshift)
    yl, yh = DTCWTForward(J=3, biort=biort, qshift=qshift)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


@pytest.mark.parametrize("shape", [(65, 65), (66, 64), (63, 66)])
def test_forward_parity_odd_shapes(rng, shape):
    x = rng.randn(1, 1, *shape).astype(np.float32)
    yl_ref, yh_ref = _ref_dtcwt(x, J=3)
    yl, yh = DTCWTForward(J=3)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


def test_inverse_parity(rng):
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    yl, yh = DTCWTForward(J=2)(jnp.asarray(x))
    yl_np = np.asarray(yl)
    yh_np = [np.asarray(h) for h in yh]
    ref = _ref_idtcwt(yl_np, yh_np)
    got = DTCWTInverse()((jnp.asarray(yl_np), [jnp.asarray(h) for h in yh_np]))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_roundtrip(rng):
    x = jnp.asarray(rng.randn(1, 2, 64, 64).astype(np.float32))
    for biort, qshift in [("near_sym_a", "qshift_a"),
                          ("near_sym_b", "qshift_b")]:
        yl, yh = DTCWTForward(J=3, biort=biort, qshift=qshift)(x)
        xr = DTCWTInverse(biort=biort, qshift=qshift)((yl, yh))
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_skip_hps(rng):
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    yl, yh = DTCWTForward(J=3, skip_hps=[True, False, False])(jnp.asarray(x))
    assert yh[0] is None
    assert yh[1] is not None
    yl_ref, yh_ref = _ref_dtcwt(x, J=3, skip_hps=[True, False, False])
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yh[1]), yh_ref[1], atol=1e-4)
    # inverse accepts the None scale
    xr = DTCWTInverse()((yl, yh))
    assert xr.shape == (1, 1, 64, 64)


def test_include_scale(rng):
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    scales, yh = DTCWTForward(J=2, include_scale=True)(jnp.asarray(x))
    s_ref, yh_ref = _ref_dtcwt(x, J=2, include_scale=True)
    for a, b in zip(scales, s_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


@pytest.mark.parametrize("o_dim,ri_dim", [(2, -1), (1, -1), (3, 1)])
def test_dim_permutations(rng, o_dim, ri_dim):
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    yl_ref, yh_ref = _ref_dtcwt(x, J=2, o_dim=o_dim, ri_dim=ri_dim)
    yl, yh = DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


def test_gradient_is_inverse_shaped(rng):
    """FWD backward == INV with same filters (reference
    tests/test_dtcwt_grad.py strategy, analytic form)."""
    x = jnp.asarray(rng.randn(1, 1, 32, 32).astype(np.float32))
    xfm = DTCWTForward(J=2)

    (yl, yh), vjp = jax.vjp(lambda v: xfm(v), x)
    ct_l = jnp.asarray(rng.randn(*yl.shape).astype(np.float32))
    ct_h = [jnp.asarray(rng.randn(*h.shape).astype(np.float32)) for h in yh]
    (dx,) = vjp((ct_l, ct_h))
    assert dx.shape == x.shape
    assert np.isfinite(np.asarray(dx)).all()

    # orthogonal-ish check: grad of 0.5||Wx||^2 ~ W^T W x stays finite and
    # close to x in energy (DTCWT is a tight-ish frame)
    def energy(v):
        yl2, yh2 = xfm(v)
        return 0.5 * (jnp.sum(yl2 ** 2) + sum(jnp.sum(h ** 2) for h in yh2))

    g = jax.grad(energy)(x)
    ratio = float(jnp.linalg.norm(g) / jnp.linalg.norm(x))
    assert 0.8 < ratio < 1.2


def test_jit_compiles(rng):
    x = jnp.asarray(rng.randn(1, 1, 64, 64).astype(np.float32))
    xfm = DTCWTForward(J=2)
    f = jax.jit(lambda v: xfm(v))
    yl, yh = f(x)
    yl2, yh2 = xfm(x)
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl2), atol=1e-6)


def test_zero_padding_mode_parity(rng):
    """Level-1 'zero' padding variant (J2+ is always symmetric)."""
    x = rng.randn(1, 1, 64, 64).astype(np.float32)
    pywt_shim.install()
    from pytorch_wavelets.dtcwt.transform2d import DTCWTForward as Ref

    xfm_ref = Ref(J=2, mode="zero")
    with torch.no_grad():
        yl_ref, yh_ref = xfm_ref(torch.from_numpy(x))
    yl, yh = DTCWTForward(J=2, mode="zero")(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yl), yl_ref.numpy(), atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Real-image validation (reference tests/test_dtcwt.py:30-44 uses the
# barbara dataset; loaded at test time from the read-only reference tree)

BARBARA_NPZ = "/root/reference/pytorch_wavelets/tests/barbara.npz"


@pytest.fixture(scope="module")
def barbara():
    np.load  # keep linters quiet
    import os
    if not os.path.exists(BARBARA_NPZ):
        pytest.skip("reference barbara fixture unavailable")
    img = np.load(BARBARA_NPZ)["barbara"].astype(np.float32)
    img = (img / img.max()).transpose(2, 0, 1)[None]   # (1, 3, 512, 512)
    return img[:, :, :256, :256]                        # keep CPU time sane


def test_real_image_forward_parity(barbara):
    yl_ref, yh_ref = _ref_dtcwt(barbara, J=3)
    yl, yh = DTCWTForward(J=3)(jnp.asarray(barbara))
    np.testing.assert_allclose(np.asarray(yl), yl_ref, atol=1e-4)
    for a, b in zip(yh, yh_ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)


def test_real_image_roundtrip(barbara):
    """Perfect-reconstruction on a real image (reference
    tests/test_dtcwt.py end-to-end property)."""
    xfm, ifm = DTCWTForward(J=3), DTCWTInverse()
    yl, yh = xfm(jnp.asarray(barbara))
    rec = ifm((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), barbara, atol=5e-5)
