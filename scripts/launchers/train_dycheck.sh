#!/bin/bash
# DyCheck (iphone) 4-scene suite: train -> render -> metrics per scene
# (ref scripts/train_dycheck.sh; the reference fans scenes across GPUs via
# CUDA_VISIBLE_DEVICES — on a TPU pod, fan scenes across hosts instead).
set -e
DATA=${DATA:-data/dycheck}
OUT=${OUT:-output/dycheck}
for scene in spin space-out teddy apple; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs fourdgs_tpu/configs/dycheck/default.py --expname "dycheck/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
