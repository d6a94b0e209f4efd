#!/usr/bin/env python3
"""Push-button BASELINE-config-1 parity harness.

Given the reference's pretrained `netG_A2B` checkpoint and the OCTA
test set, runs the 297-file evaluation (reference `eval`,
utils.py:182-214) through BOTH stacks —

  * ours:  convert .pth -> flax, jitted `make_sr_infer` (frequency
           split at radii 10/8, NetworkA2B, eval-mode BN)
  * theirs: the reference `model.NetworkA2B` loaded with the same .pth,
           run in-process on torch CPU (the literal eval math, minus
           the hard-coded `.cuda()`)

— scores both with the same skimage-matching metrics (PSNR
data_range=2 / SSIM / MSE / NMI, utils.py:209-212) and prints the
±0.1 dB BASELINE verdict.  Neither the real weights nor the OCTA
dataset ship in either tree, so this harness is exercised end to end
on synthetic stand-ins by tests/test_parity_harness.py; when the real
artifacts land the check is one command:

    python parity.py --weights netG_A2B_pretrained.pth --data DIR

DIR layout (reference utils.py:183-194): DIR/6mm_x2/{i}_6.png (LR)
and DIR/3mm/{i}_3.png (HR).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

TOL_DB = 0.1


def _load_pairs(data_dir: str, count: int):
    """[(lr, hr) float32 normalized arrays] per utils.py:187-204."""
    from ficsr_tpu.data.datasets import load_grayscale

    lr_dir = os.path.join(data_dir, "6mm_x2")
    hr_dir = os.path.join(data_dir, "3mm")
    pairs = []
    for i in range(count):
        lp = os.path.join(lr_dir, f"{i}_6.png")
        hp = os.path.join(hr_dir, f"{i}_3.png")
        if not (os.path.isfile(lp) and os.path.isfile(hp)):
            continue
        to_f = lambda p: (load_grayscale(p).astype(np.float32) / 255.0
                          - 0.5) / 0.5
        pairs.append((to_f(lp), to_f(hp)))
    return pairs


def eval_ours(state_dict, pairs, batch: int = 8):
    """Converted weights through our jitted eval path."""
    from ficsr_tpu.convert import from_torch
    from ficsr_tpu.train.evaluate import _batched_scores, _mean, make_sr_infer

    variables = from_torch.convert_network_a2b(state_dict)
    infer = make_sr_infer(variables)
    return _mean(_batched_scores(infer, pairs, batch))


def eval_reference(state_dict, pairs):
    """The reference eval loop (utils.py:182-214) on torch CPU."""
    import torch

    from ficsr_tpu.train.evaluate import _mean, score_pair
    from tests.ref_shims import load_reference_module

    ref_model = load_reference_module("model")
    net = ref_model.NetworkA2B()
    net.load_state_dict({k: torch.as_tensor(np.asarray(v))
                         for k, v in state_dict.items()})
    net.eval()

    def split(x, hf_r, lf_r):
        # utils.high_pass/low_pass math (utils.py:93-117) without .cuda()
        img = x[0, 0]
        f = torch.fft.fftshift(torch.fft.fft2(img))
        h, w = img.shape
        ii = torch.arange(h)[:, None] - h // 2
        jj = torch.arange(w)[None, :] - w // 2
        d2 = (ii ** 2 + jj ** 2).float()
        hf = torch.abs(torch.fft.ifft2(torch.fft.ifftshift(
            f * (1 - torch.exp(-0.5 * d2 / hf_r ** 2)))))
        lf = -torch.abs(torch.fft.ifft2(torch.fft.ifftshift(
            f * torch.exp(-0.5 * d2 / lf_r ** 2))))
        return lf[None, None], (hf[None, None] + x) / 2.0

    scores = []
    with torch.no_grad():
        for lr, hr in pairs:
            x = torch.from_numpy(lr)[None, None]
            lf, hf = split(x, 10, 8)                   # utils.py:202-204
            _, _, sr = net(lf, hf)
            scores.append(score_pair(sr.numpy()[0, 0], hr))
    return _mean(scores)


def run(weights: str, data: str, count: int = 297, batch: int = 8) -> dict:
    from ficsr_tpu.convert.from_torch import load_torch_checkpoint

    pairs = _load_pairs(data, count)
    if not pairs:
        raise SystemExit(f"no {{i}}_6.png/{{i}}_3.png pairs under {data}")
    state_dict = load_torch_checkpoint(weights)
    ours = eval_ours(state_dict, pairs, batch)
    ref = eval_reference(state_dict, pairs)
    delta = ours["psnr"] - ref["psnr"]
    verdict = {
        "n_pairs": len(pairs),
        "ours": ours,
        "reference": ref,
        "delta_psnr_db": delta,
        "tolerance_db": TOL_DB,
        "pass": bool(abs(delta) <= TOL_DB),
    }
    return verdict


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", required=True, help="netG_A2B .pth")
    ap.add_argument("--data", required=True,
                    help="dir with 6mm_x2/ and 3mm/ subdirs")
    ap.add_argument("--count", type=int, default=297)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)
    v = run(args.weights, args.data, args.count, args.batch)
    print(json.dumps(v, indent=1))
    print(f"PSNR ours {v['ours']['psnr']:.4f} vs reference "
          f"{v['reference']['psnr']:.4f} (delta {v['delta_psnr_db']:+.4f} dB)"
          f" -> {'PASS' if v['pass'] else 'FAIL'} (tol {TOL_DB} dB)")
    return 0 if v["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
