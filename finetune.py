#!/usr/bin/env python3
"""Paired generator fine-tuning CLI (BASELINE config 3).

    python finetune.py --dataroot ./dataset/evalution_6mm/parts \
        --pretrained_root pre_trained/netG_A2B_pretrained.pth \
        --batchSize 4 --n_epochs 20 --lr 1e-4

Dataset layout: dataroot/LR/*_lr.png paired with dataroot/HR/*_hr.png
(the reference's ImageDataset_6mm convention, dataset.py:39-61).
"""

import argparse
import os
import time

from ficsr_tpu import tpu_tuning

tpu_tuning.apply(train=True)  # measured libtpu flags; before jax import


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--pretrained_root", default="")
    p.add_argument("--batchSize", type=int, default=4)
    p.add_argument("--n_epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--lambda_ssim", type=float, default=1.0)
    p.add_argument("--lambda_wavelet", type=float, default=0.5)
    p.add_argument("--output_dir", default="./finetune_exp")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ficsr_tpu.models.layers import set_layout
    from ficsr_tpu.train.config import resolve_layout
    set_layout(resolve_layout(train=True, batch=args.batchSize))

    from ficsr_tpu.data.datasets import ImageDataset6mm
    from ficsr_tpu.data.pipeline import normalize, paired_random_crop, to_unit
    from ficsr_tpu.train import evaluate
    from ficsr_tpu.train.finetune import (
        build_finetune_step, create_finetune_state)

    dataset = ImageDataset6mm(args.dataroot)
    print(f"{len(dataset)} pairs")

    variables = None
    if args.pretrained_root:
        from ficsr_tpu.convert.from_torch import (
            convert_network_a2b, load_torch_checkpoint)

        variables = convert_network_a2b(
            load_torch_checkpoint(args.pretrained_root))
    rng = jax.random.PRNGKey(args.seed)
    state = create_finetune_state(rng, args.crop, variables)
    step = build_finetune_step(args.lambda_ssim, args.lambda_wavelet)

    n = len(dataset)
    b = args.batchSize
    order_rng = np.random.RandomState(args.seed)
    for epoch in range(args.n_epochs):
        order = order_rng.permutation(n)
        t0, seen = time.time(), 0
        for i in range(0, n - b + 1, b):
            pairs = [dataset[int(j)] for j in order[i:i + b]]
            lr_u8 = jnp.asarray(np.stack([a for a, _ in pairs]))
            hr_u8 = jnp.asarray(np.stack([h for _, h in pairs]))
            rng, k = jax.random.split(rng)
            lr_f = normalize(to_unit(lr_u8))
            hr_f = normalize(to_unit(hr_u8))
            lr_c, hr_c = paired_random_crop(lr_f, hr_f, args.crop, k)
            lr_img = lr_c[:, None]
            hr_img = hr_c[:, None]
            state, metrics = step(state, lr_img, hr_img, args.lr)
            seen += b
        m = {k2: float(v) for k2, v in jax.device_get(metrics).items()}
        print("epoch %d  %s  %.1f img/s" % (
            epoch, " ".join(f"{k2}={v:.4f}" for k2, v in sorted(m.items())),
            seen / (time.time() - t0)))

        infer = evaluate.make_sr_infer(
            {"params": state.params, "batch_stats": state.stats})
        evaluate.eval_6m(infer, dataset, crop=args.crop)

    os.makedirs(args.output_dir, exist_ok=True)
    from ficsr_tpu.convert.to_torch import (
        export_network_a2b, save_torch_checkpoint)

    save_torch_checkpoint(
        os.path.join(args.output_dir, "netG_A2B_finetuned.pth"),
        export_network_a2b({"params": jax.device_get(state.params),
                            "batch_stats": jax.device_get(state.stats)}))
    print("saved", os.path.join(args.output_dir, "netG_A2B_finetuned.pth"))


if __name__ == "__main__":
    main()
