"""End-to-end exercise of the push-button BASELINE-config-1 harness
(parity.py) on synthetic stand-ins: a random-init reference NetworkA2B
checkpoint + a tiny synthetic {i}_6.png/{i}_3.png test set.  When the
real .pth / OCTA data land, the real check is zero work (VERDICT r3
next #5)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from . import ref_shims

pytestmark = pytest.mark.slow

SIZE = 64
N_PAIRS = 3


@pytest.fixture()
def synthetic_setup(tmp_path, rng):
    from PIL import Image

    lr_dir = tmp_path / "6mm_x2"
    hr_dir = tmp_path / "3mm"
    lr_dir.mkdir()
    hr_dir.mkdir()
    for i in range(N_PAIRS):
        for d, suffix in ((lr_dir, "_6"), (hr_dir, "_3")):
            img = rng.randint(0, 256, (SIZE, SIZE)).astype(np.uint8)
            Image.fromarray(img, "L").save(d / f"{i}{suffix}.png")
    # a couple of missing indices — the reference loop skips them
    ref_model = ref_shims.load_reference_module("model")
    torch.manual_seed(3)
    net = ref_model.NetworkA2B()
    weights = tmp_path / "netG_A2B_synthetic.pth"
    torch.save(net.state_dict(), weights)
    return str(weights), str(tmp_path)


def test_parity_harness_synthetic(synthetic_setup):
    import parity

    weights, data = synthetic_setup
    v = parity.run(weights, data, count=N_PAIRS + 2)
    assert v["n_pairs"] == N_PAIRS
    # same weights through both stacks: the converter parity bound
    # (outputs agree ~1e-5) keeps the PSNR delta far inside 0.1 dB
    assert v["pass"], v
    assert abs(v["delta_psnr_db"]) < 0.02, v
    for k in ("psnr", "ssim", "mse", "nmi"):
        assert np.isfinite(v["ours"][k]) and np.isfinite(v["reference"][k])
    # non-PSNR metrics agree too
    assert abs(v["ours"]["ssim"] - v["reference"]["ssim"]) < 5e-3


def test_parity_harness_cli(synthetic_setup):
    """The CLI prints one JSON verdict and exits 0 on PASS."""
    weights, data = synthetic_setup
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "parity.py"),
         "--weights", weights, "--data", data, "--count", str(N_PAIRS)],
        capture_output=True, text=True, timeout=900, env=env)
    assert p.returncode == 0, p.stderr[-2000:]
    payload = p.stdout[p.stdout.index("{"):p.stdout.rindex("}") + 1]
    v = json.loads(payload)
    assert v["pass"] is True
