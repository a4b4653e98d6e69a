#!/bin/bash
# HyperNeRF interp split, 6 scenes (ref scripts/train_hyper_interp.sh).
set -e
DATA=${DATA:-data/hypernerf/interp}
OUT=${OUT:-output/hypernerf/interp}
for scene in aleks-teapot slice-banana chickchicken cut-lemon1 hand1-dense-v2 torchocolate; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs fourdgs_tpu/configs/hypernerf/default.py \
    --expname "hypernerf/interp/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
