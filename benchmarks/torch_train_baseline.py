"""Measure the reference PyTorch CPU TRAIN-step throughput — the
comparison point for the train-side `vs_baseline` (the inference
counterpart lives in torch_baseline.py / baseline_cpu.json).

Replicates one reference training step on CPU torch exactly as
`/root/reference/train.py:164-269` schedules it at its native batch
size 1: six generator forwards over the FFT frequency splits
(train.py:170-214), the active G loss cocktail + backward + AdamW step
(train.py:217-239), and both discriminator updates with replay buffers
(train.py:241-269).  The reference's own modules run (loaded through
tests/ref_shims with the pywt shim), so this is the real reference
compute, not a re-implementation.

Usage: python benchmarks/torch_train_baseline.py [iters]
Writes benchmarks/baseline_cpu_train.json.
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch

from torch_baseline import freq_split_torch  # reference split math


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    torch.set_num_threads(1)
    torch.manual_seed(0)

    import ref_shims

    model = ref_shims.load_reference_module("model")
    utils = ref_shims.load_reference_module("utils")

    netG_A2B = model.NetworkA2B()
    netG_B2A = model.NetworkB2A()
    netD_A = model.FS_DiscriminatorA(1)   # train.py:75 (positional quirk)
    netD_B = model.FS_DiscriminatorB(1)
    for n in (netG_A2B, netG_B2A, netD_A, netD_B):
        n.train()

    criterion_GAN = torch.nn.MSELoss()
    criterion_cycle = torch.nn.L1Loss()
    criterion_identity = torch.nn.L1Loss()
    criterion_feature = torch.nn.BCEWithLogitsLoss()
    criterion_tv = model.TVLoss()
    opt_G = torch.optim.AdamW(
        itertools.chain(netG_A2B.parameters(), netG_B2A.parameters()),
        lr=1.3e-4, betas=(0.9, 0.999))
    opt_D = torch.optim.AdamW(
        itertools.chain(netD_A.parameters(), netD_B.parameters()),
        lr=1.3e-4, betas=(0.9, 0.999))
    buf_A, buf_B = utils.ReplayBuffer(), utils.ReplayBuffer()
    target_real = torch.flatten(torch.ones(1))
    target_fake = torch.flatten(torch.zeros(1))
    beta1, beta2, beta3, beta4, beta5 = 0.25, 10.0, 2.0, 0.5, 0.5

    rs = np.random.RandomState(0)
    real_A = torch.from_numpy(
        rs.uniform(-1, 1, (1, 1, 256, 256)).astype(np.float32))
    real_B = torch.from_numpy(
        rs.uniform(-1, 1, (1, 1, 256, 256)).astype(np.float32))

    def step():
        # ---- forward, exactly train.py:170-214 ----
        lf, hf = freq_split_torch(real_A, 10, 8)
        lf_feat_A, hf_feat_A, fake_B = netG_A2B(lf, hf)
        _ = criterion_tv(fake_B) * 0.5            # computed, unused (train.py:178)
        _, _, idt_A = netG_B2A(hf, lf)
        hf_feat_A = hf_feat_A.detach()
        lf_feat_A = lf_feat_A.detach()
        lf, hf = freq_split_torch(fake_B, 5, 14)
        hf_fr_A, lf_fr_A, recovered_A = netG_B2A(hf, lf)
        lf, hf = freq_split_torch(real_B, 5, 14)
        hf_feat_B, lf_feat_B, fake_A = netG_B2A(hf, lf)
        _, _, idt_B = netG_A2B(lf, hf)
        lf_feat_B = lf_feat_B.detach()
        hf_feat_B = hf_feat_B.detach()
        lf, hf = freq_split_torch(fake_A, 10, 8)
        lf_fr_B, hf_fr_B, recovered_B = netG_A2B(lf, hf)

        # ---- G update (train.py:217-239) ----
        utils.set_requires_grad([netD_A, netD_B], False)
        opt_G.zero_grad()
        loss_GAN_A2B = criterion_GAN(netD_B(fake_B), target_real) * beta4
        loss_GAN_B2A = criterion_GAN(netD_A(fake_A), target_real) * beta5
        loss_cycle_ABA = criterion_cycle(recovered_A, real_A) * beta3 + \
            criterion_feature(hf_feat_A, hf_fr_A)
        loss_cycle_BAB = criterion_cycle(recovered_B, real_B) * beta3 + \
            beta1 * criterion_feature(hf_feat_B, hf_fr_B)
        loss_idt = criterion_identity(real_A, idt_A) * beta2 + \
            criterion_identity(real_B, idt_B) * beta2
        loss_G = (loss_GAN_A2B + loss_GAN_B2A + loss_cycle_ABA
                  + loss_cycle_BAB + loss_idt)
        loss_G.backward()
        opt_G.step()

        # ---- D update (train.py:241-269) ----
        utils.set_requires_grad([netD_A, netD_B], True)
        opt_D.zero_grad()
        loss_D_A = 0.5 * (
            criterion_GAN(netD_A(real_A), target_real)
            + criterion_GAN(netD_A(buf_A.push_and_pop(fake_A).detach()),
                            target_fake))
        loss_D_A.backward()
        loss_D_B = 0.5 * (
            criterion_GAN(netD_B(real_B), target_real)
            + criterion_GAN(netD_B(buf_B.push_and_pop(fake_B).detach()),
                            target_fake))
        loss_D_B.backward()
        opt_D.step()
        return float(loss_G)

    step()  # warm-up (allocator, lazy inits)
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters

    out = {
        "torch_cpu_train_steps_per_sec": 1.0 / dt,
        "torch_cpu_train_ms_per_step": dt * 1e3,
        "batch": 1,
        "iters": iters,
        "threads": 1,
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu_train.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
