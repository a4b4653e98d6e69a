#!/bin/bash
# HyperNeRF vrig suite (ref scripts/train_hyper_virg.sh)
set -e
DATA=${DATA:-data/hypernerf}
OUT=${OUT:-output/hypernerf}
for scene in 3dprinter banana broom2 chicken; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs fourdgs_tpu/configs/hypernerf/$scene.py --expname "hypernerf/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
