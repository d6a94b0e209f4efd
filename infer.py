#!/usr/bin/env python3
"""Single-image OCTA super-resolution inference (BASELINE config 1).

Loads a reference PyTorch checkpoint (netG_A2B state_dict .pth) or an
orbax checkpoint and super-resolves grayscale OCTA patches:

    python infer.py --ckpt pre_trained/netG_A2B_pretrained.pth \
        --input lr.png --output sr.png
    python infer.py --ckpt ./output_exp --orbax --input dir_of_pngs/ \
        --output out_dir/

The inference recipe matches the reference eval path (utils.py:202-205):
hf = (high_pass(x, 10) + x)/2, lf = low_pass(x, 8), NetworkA2B in eval
BN mode, center-crop 256, [-1,1] normalization.
"""

import argparse
import os
import sys

import numpy as np

from ficsr_tpu import tpu_tuning

tpu_tuning.apply()  # measured libtpu flags; before jax import


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help=".pth state_dict or orbax checkpoint dir")
    p.add_argument("--orbax", action="store_true")
    p.add_argument("--input", required=True, help="PNG file or directory")
    p.add_argument("--output", required=True, help="output file or directory")
    p.add_argument("--crop", type=int, default=0,
                   help="center-crop size (0 = full image; must be even)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 activations (94.8 dB agreement w/ fp32)")
    p.add_argument("--conv_fold", default="auto",
                   choices=["auto", "off", "region"],
                   help="persistent-fold-region convs (exact; see "
                        "resolve_conv_fold_infer)")
    args = p.parse_args()

    if not os.path.exists(args.ckpt):
        sys.exit(f"error: checkpoint not found: {args.ckpt}")
    if not os.path.exists(args.input):
        sys.exit(f"error: input not found: {args.input}")

    import jax
    import jax.numpy as jnp

    from ficsr_tpu.models.layers import set_layout
    from ficsr_tpu.train.config import resolve_layout
    set_layout(resolve_layout())  # NHWC on TPU (faster forwards)

    from ficsr_tpu.data.datasets import load_grayscale
    from ficsr_tpu.data.pipeline import center_crop, normalize, to_unit
    from ficsr_tpu.train import evaluate

    if args.orbax:
        from ficsr_tpu.train.checkpoint import restore_checkpoint
        from ficsr_tpu.train.config import TrainConfig
        from ficsr_tpu.train.state import create_train_state

        template = create_train_state(TrainConfig(), jax.random.PRNGKey(0))
        state = restore_checkpoint(args.ckpt, template)
        variables = {"params": state.g_params["a2b"],
                     "batch_stats": state.g_stats["a2b"]}
    else:
        from ficsr_tpu.convert.from_torch import (
            convert_network_a2b, load_torch_checkpoint)

        variables = convert_network_a2b(load_torch_checkpoint(args.ckpt))

    infer = evaluate.make_sr_infer(variables, bf16=args.bf16,
                                   conv_fold=args.conv_fold)

    if os.path.isdir(args.input):
        names = sorted(
            f for f in os.listdir(args.input)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
        paths = [os.path.join(args.input, f) for f in names]
        os.makedirs(args.output, exist_ok=True)
        outs = [os.path.join(args.output, f) for f in names]
    else:
        paths, outs = [args.input], [args.output]

    from PIL import Image

    def save(out_path, sr):
        u8 = np.clip((sr + 1.0) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(u8, mode="L").save(out_path)
        print(f"-> {out_path}  ({u8.shape[1]}x{u8.shape[0]})")

    if args.crop and len(paths) > 1:
        # cropping fixes the shape -> batch for throughput (one compile)
        for i in range(0, len(paths), args.batch):
            chunk = paths[i:i + args.batch]
            imgs = [center_crop(normalize(to_unit(
                jnp.asarray(load_grayscale(p)))), args.crop) for p in chunk]
            batch = jnp.stack(imgs)[:, None]
            srs = np.asarray(infer(batch))
            for out, sr in zip(outs[i:i + args.batch], srs[:, 0]):
                save(out, sr)
    else:
        for path, out in zip(paths, outs):
            x = normalize(to_unit(jnp.asarray(load_grayscale(path))))
            if args.crop:
                x = center_crop(x, args.crop)
            save(out, np.asarray(infer(x[None, None]))[0, 0])


if __name__ == "__main__":
    main()
