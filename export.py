#!/usr/bin/env python3
"""Export the SR model to a portable serving artifact (StableHLO via
jax.export): weights embedded, symbolic batch dimension.

    python export.py --ckpt pre_trained/netG_A2B_pretrained.pth \
        --output sr_model.bin [--bf16] [--platforms tpu,cpu]

Serve it without any model code:

    from ficsr_tpu.serving import load_sr
    sr = load_sr("sr_model.bin")
    y = sr(x)   # (N,1,256,256) float32 in [-1,1] -> (N,1,256,256) SR
"""

import argparse
import os
import sys

from ficsr_tpu import tpu_tuning

tpu_tuning.apply()  # measured libtpu flags; before jax import


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help=".pth state_dict or orbax checkpoint dir")
    p.add_argument("--orbax", action="store_true")
    p.add_argument("--output", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--platforms", default="",
                   help="comma-separated (e.g. tpu,cpu); default: current")
    args = p.parse_args()

    if not os.path.exists(args.ckpt):
        sys.exit(f"error: checkpoint not found: {args.ckpt}")

    import jax

    from ficsr_tpu.models.layers import set_layout
    from ficsr_tpu.serving import export_sr
    from ficsr_tpu.train.config import resolve_layout

    set_layout(resolve_layout())

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

    platforms = [s for s in args.platforms.split(",") if s] or None
    blob = export_sr(variables, size=args.size, bf16=args.bf16,
                     platforms=platforms)
    with open(args.output, "wb") as fh:
        fh.write(blob)
    print(f"wrote {args.output} ({len(blob) / 1e6:.1f} MB, "
          f"size={args.size}, bf16={args.bf16}, "
          f"platforms={platforms or 'current'})")


if __name__ == "__main__":
    main()
