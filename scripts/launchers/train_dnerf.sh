#!/bin/bash
# D-NeRF 8-scene benchmark suite: train -> render -> metrics per scene
# (ref scripts/train_dnerf.sh; reference fans scenes across GPUs via
# CUDA_VISIBLE_DEVICES — on a TPU pod, fan scenes across hosts instead).
set -e
DATA=${DATA:-data/dnerf}
OUT=${OUT:-output/dnerf}
for scene in bouncingballs hellwarrior hook jumpingjacks lego mutant standup trex; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs fourdgs_tpu/configs/dnerf/$scene.py --expname "dnerf/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
