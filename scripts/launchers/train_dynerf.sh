#!/bin/bash
# DyNeRF/Neu3D suite (ref scripts/train_dynerf.sh)
set -e
DATA=${DATA:-data/dynerf}
OUT=${OUT:-output/dynerf}
for scene in coffee_martini cook_spinach cut_roasted_beef flame_salmon_1 flame_steak sear_steak; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs fourdgs_tpu/configs/dynerf/$scene.py --expname "dynerf/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
