"""Fixture-golden + property tests for the eval metric ruler
(VERDICT r2 weak #3).

`ops/metrics.py` re-implements the skimage metrics the reference scores
with (`utils.py:209-212`): PSNR(data_range=2), metric-flavor SSIM (7x7
uniform window, sample-covariance normalization, border crop), MSE, and
NMI (100-bin joint histogram).  skimage itself is absent from this
environment, so the future ±0.1 dB parity comparison will be measured
with THIS ruler — these tests pin it three independent ways:

  1. an O(N² w²) direct sliding-window SSIM oracle (explicit per-window
     means/covariances on a symmetric pad — shares no code with the
     separable cumsum production path);
  2. closed-form hand-derivable cases (constant images, tiny discrete
     histograms);
  3. frozen numeric fixtures (values computed once from the oracle and
     hard-coded, so the oracle and production code cannot drift
     together silently);

plus the invariance/ordering properties skimage documents.
"""

import math

import numpy as np
import pytest

from ficsr_tpu.ops import metrics as M


# ---------------------------------------------------------------------------
# independent SSIM oracle
# ---------------------------------------------------------------------------


def ssim_direct(im1, im2, win=7, dr=2.0, K1=0.01, K2=0.03):
    """Direct per-window SSIM from the published formula (Wang et al.
    2004 eq. 13 with skimage's uniform window + sample covariance)."""
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    pad = win // 2
    p1 = np.pad(im1, pad, mode="symmetric")
    p2 = np.pad(im2, pad, mode="symmetric")
    h, w = im1.shape
    S = np.zeros((h, w))
    NP = win * win
    cov_norm = NP / (NP - 1)
    C1, C2 = (K1 * dr) ** 2, (K2 * dr) ** 2
    for i in range(h):
        for j in range(w):
            w1 = p1[i:i + win, j:j + win].ravel()
            w2 = p2[i:i + win, j:j + win].ravel()
            ux, uy = w1.mean(), w2.mean()
            vx = cov_norm * (np.mean(w1 * w1) - ux * ux)
            vy = cov_norm * (np.mean(w2 * w2) - uy * uy)
            vxy = cov_norm * (np.mean(w1 * w2) - ux * uy)
            S[i, j] = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
                (ux * ux + uy * uy + C1) * (vx + vy + C2))
    return S[pad:-pad, pad:-pad].mean()


def _fixture_images():
    rs = np.random.RandomState(42)
    a = np.clip(rs.standard_normal((24, 24)) * 0.5, -1, 1)
    b = np.clip(a + rs.standard_normal((24, 24)) * 0.2, -1, 1)
    c = np.clip(rs.uniform(-1, 1, (16, 20)), -1, 1)
    d = np.clip(c * 0.7 - 0.1, -1, 1)
    return a, b, c, d


def test_ssim_matches_direct_oracle():
    a, b, c, d = _fixture_images()
    for x, y in [(a, b), (c, d), (a, a)]:
        assert abs(M.structural_similarity(x, y) - ssim_direct(x, y)) < 1e-10


def test_ssim_frozen_fixtures():
    """Hard-coded oracle values (2026-08-17) — a drift in either
    implementation trips this even if both drift identically later."""
    a, b, c, d = _fixture_images()
    assert abs(M.structural_similarity(a, b) - 0.681592030045) < 1e-9
    assert abs(M.structural_similarity(c, d) - 0.172781618623) < 1e-9


def test_ssim_identity_is_one():
    a, _, c, _ = _fixture_images()
    assert M.structural_similarity(a, a) == pytest.approx(1.0, abs=1e-12)
    assert M.structural_similarity(c, c) == pytest.approx(1.0, abs=1e-12)


def test_ssim_constant_images_closed_form():
    """Constant images: variances vanish, S = (2ab+C1)/(a²+b²+C1)."""
    for va, vb in [(0.3, 0.5), (-0.2, 0.4), (0.0, 0.0)]:
        im1 = np.full((12, 12), va)
        im2 = np.full((12, 12), vb)
        C1 = (0.01 * 2.0) ** 2
        expect = (2 * va * vb + C1) / (va * va + vb * vb + C1)
        assert M.structural_similarity(im1, im2) == pytest.approx(
            expect, abs=1e-12)


def test_ssim_degradation_ordering():
    """More noise -> strictly lower SSIM (known-degradation ordering)."""
    rs = np.random.RandomState(7)
    a = np.clip(rs.standard_normal((32, 32)) * 0.4, -1, 1)
    noise = rs.standard_normal((32, 32))
    vals = [M.structural_similarity(a, np.clip(a + s * noise, -1, 1))
            for s in (0.0, 0.05, 0.15, 0.4)]
    assert vals[0] == pytest.approx(1.0, abs=1e-12)
    assert vals[0] > vals[1] > vals[2] > vals[3]


def test_ssim_symmetry():
    a, b, _, _ = _fixture_images()
    assert M.structural_similarity(a, b) == pytest.approx(
        M.structural_similarity(b, a), abs=1e-12)


# ---------------------------------------------------------------------------
# NMI
# ---------------------------------------------------------------------------


def test_nmi_identity_is_two():
    """NMI(x, x) = (H+H)/H = 2 whenever the joint histogram is diagonal."""
    rs = np.random.RandomState(3)
    x = rs.uniform(-1, 1, (64, 64))
    assert M.normalized_mutual_information(x, x) == pytest.approx(
        2.0, abs=1e-12)


def test_nmi_independent_structure_hand_case():
    """im1=[0,0,1,1] vs im2=[0,1,0,1] at 2 bins: joint uniform over 4
    cells -> H1=H2=ln2, H12=ln4 -> NMI=1 (fully independent)."""
    x = np.array([0.0, 0.0, 1.0, 1.0])
    y = np.array([0.0, 1.0, 0.0, 1.0])
    assert M.normalized_mutual_information(x, y, bins=2) == pytest.approx(
        1.0, abs=1e-12)


def test_nmi_partial_dependence_hand_case():
    """im1=[0,0,1,1] vs im2=[0,1,1,1] at 2 bins.  Joint = {(0,0):1,
    (0,1):1, (1,1):2}; closed form (H1+H2)/H12 computed by hand."""
    x = np.array([0.0, 0.0, 1.0, 1.0])
    y = np.array([0.0, 1.0, 1.0, 1.0])
    h1 = math.log(2)
    h2 = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
    h12 = -(2 * 0.25 * math.log(0.25) + 0.5 * math.log(0.5))
    expect = (h1 + h2) / h12            # = 1.207518749639
    got = M.normalized_mutual_information(x, y, bins=2)
    assert got == pytest.approx(expect, abs=1e-12)
    assert got == pytest.approx(1.207518749639, abs=1e-9)  # frozen


def test_nmi_frozen_fixture():
    a, b, _, _ = _fixture_images()
    assert M.normalized_mutual_information(a, b) == pytest.approx(
        1.422011075057, abs=1e-9)


def test_nmi_affine_invariance():
    """Affine rescaling both images leaves the (range-binned) joint
    histogram — hence NMI — unchanged."""
    rs = np.random.RandomState(5)
    x = rs.uniform(-1, 1, (48, 48))
    y = np.clip(x + rs.standard_normal((48, 48)) * 0.3, -1, 1)
    base = M.normalized_mutual_information(x, y)
    scaled = M.normalized_mutual_information(3.0 * x - 1.0, 0.5 * y + 2.0)
    assert scaled == pytest.approx(base, abs=1e-12)


def test_nmi_degradation_ordering():
    """identity > noisy > shuffled (no structure)."""
    rs = np.random.RandomState(11)
    x = rs.uniform(-1, 1, (64, 64))
    noisy = np.clip(x + rs.standard_normal((64, 64)) * 0.2, -1, 1)
    shuffled = x.ravel().copy()
    rs.shuffle(shuffled)
    shuffled = shuffled.reshape(x.shape)
    n_id = M.normalized_mutual_information(x, x)
    n_noisy = M.normalized_mutual_information(x, noisy)
    n_shuf = M.normalized_mutual_information(x, shuffled)
    assert n_id > n_noisy > n_shuf
    # finite-sample MI bias with a 100x100-bin histogram over 64² samples
    # keeps "independent" visibly above the 1.0 floor; just bound it
    assert 1.0 <= n_shuf < 1.2


def test_nmi_range_lower_bound():
    """NMI >= 1 by definition (H1+H2 >= H12 always)."""
    rs = np.random.RandomState(13)
    for _ in range(3):
        x = rs.uniform(-1, 1, (32, 32))
        y = rs.uniform(-1, 1, (32, 32))
        assert M.normalized_mutual_information(x, y) >= 1.0


# ---------------------------------------------------------------------------
# PSNR / MSE closed forms
# ---------------------------------------------------------------------------


def test_psnr_closed_form_constant_offset():
    """Images differing by constant d: PSNR = 10 log10(4/d²)."""
    a = np.linspace(-1, 1, 100).reshape(10, 10)
    for d in (0.1, 0.02):
        expect = 10 * math.log10(4.0 / d ** 2)
        assert M.peak_signal_noise_ratio(a, a + d) == pytest.approx(
            expect, abs=1e-9)


def test_mse_closed_form():
    a = np.zeros((4, 4))
    b = np.full((4, 4), 0.5)
    assert M.mean_squared_error(a, b) == pytest.approx(0.25, abs=1e-15)
