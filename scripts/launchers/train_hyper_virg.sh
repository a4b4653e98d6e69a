#!/bin/bash
# HyperNeRF vrig split, 4 scenes with per-scene configs
# (ref scripts/train_hyper_virg.sh; ref renders with --skip_train
# --skip_test, i.e. the novel-view video split only).
set -e
DATA=${DATA:-data/hypernerf/virg}
OUT=${OUT:-output/hypernerf/virg}
declare -A CFG=([broom2]=broom2 [vrig-3dprinter]=3dprinter
                [peel-banana]=banana [vrig-chicken]=chicken)
for scene in broom2 vrig-3dprinter peel-banana vrig-chicken; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs "fourdgs_tpu/configs/hypernerf/${CFG[$scene]}.py" \
    --expname "hypernerf/virg/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train --skip_test
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
