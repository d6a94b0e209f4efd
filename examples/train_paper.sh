#!/usr/bin/env bash
# The paper's training recipe as a runnable launcher — the TPU-native
# equivalent of the reference Colab notebook (`main.ipynb` cell 3):
#
#   python train.py --decay_epoch 30 --pretrained False --n_epochs 55 \
#       --lr 2e-4 --scheduler False --dataroot ./dataset/...
#
# Two deliberate differences, both documented in examples/README.md:
#   * booleans parse correctly here (the reference's argparse type=bool
#     silently turned "--scheduler False" into True, i.e. linear decay;
#     we pass the linear-decay default explicitly to reproduce the
#     reference's *actual* behavior).
#   * no pip install of the wavelet library — it is part of this repo.
#
# Usage: examples/train_paper.sh DATAROOT [extra train.py flags...]
set -euo pipefail

DATAROOT="${1:?usage: examples/train_paper.sh DATAROOT [extra flags...]}"
shift || true

exec python "$(dirname "$0")/../train.py" \
    --dataroot "$DATAROOT" \
    --n_epochs 55 \
    --decay_epoch 30 \
    --lr 2e-4 \
    --scheduler True \
    "$@"
