#!/usr/bin/env python3
"""CLI entrypoint (reference `train.py`), same flag surface.

    python train.py --n_epochs 55 --lr 2e-4 --decay_epoch 30 \
        --dataroot ./dataset/Colab_random_OCTA_augmented

Boolean flags parse correctly here (`--pretrained False` is False);
the reference's argparse type=bool footgun is intentionally not
reproduced (see ficsr_tpu/train/config.py).
"""

from ficsr_tpu import tpu_tuning

tpu_tuning.apply(train=True)  # measured libtpu flags; before jax import

from ficsr_tpu.train.config import parse_args  # noqa: E402
from ficsr_tpu.train.loop import train  # noqa: E402


def main():
    config = parse_args()
    print(config)
    train(config)


if __name__ == "__main__":
    main()
