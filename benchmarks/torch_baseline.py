"""Measure the reference PyTorch CPU inference throughput (the
BASELINE.md comparison point: >=10x single-chip speedup target).

Runs the reference NetworkA2B + the reference's FFT frequency split
math on CPU torch (their code calls .cuda(); we replicate the identical
ops on CPU) and writes images/sec to benchmarks/baseline_cpu.json.

Usage: python benchmarks/torch_baseline.py [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch


def _mask(h, w, radius, high):
    ci, cj = h // 2, w // 2
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    d2 = (i - ci) ** 2 + (j - cj) ** 2
    m = np.exp(-0.5 * d2 / radius ** 2)
    return torch.from_numpy((1 - m if high else m).astype(np.float32))


def freq_split_torch(x, hf_r, lf_r):
    # reference high_pass/low_pass math (utils.py:93-117) on CPU
    img = x[0, 0]
    f = torch.fft.fftshift(torch.fft.fft2(img))
    hf = torch.abs(torch.fft.ifft2(torch.fft.ifftshift(
        f * _mask(*img.shape, hf_r, True))))
    lf = -torch.abs(torch.fft.ifft2(torch.fft.ifftshift(
        f * _mask(*img.shape, lf_r, False))))
    hf = (hf[None, None] + x) / 2.0
    return lf[None, None], hf


def main(iters: int = 10):
    import ref_shims

    ref_model = ref_shims.load_reference_module("model")
    torch.manual_seed(0)
    net = ref_model.NetworkA2B()
    net.eval()
    x = torch.randn(1, 1, 256, 256)

    with torch.no_grad():
        lf, hf = freq_split_torch(x, 10, 8)
        net(lf, hf)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            lf, hf = freq_split_torch(x, 10, 8)
            net(lf, hf)
        dt = time.perf_counter() - t0

    ips = iters / dt
    out = {
        "torch_cpu_images_per_sec": ips,
        "iters": iters,
        "shape": [1, 1, 256, 256],
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
