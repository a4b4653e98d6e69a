#!/bin/bash
# Dynamic3DGS (CMU panoptic) 6-scene suite: train -> render -> metrics
# (ref scripts/train_dynamic3dgs.sh; scenes use the multiview reader +
# MultipleViewinfo config family, ref scene/dataset_readers.py:589).
set -e
DATA=${DATA:-data/dynamic3dgs/data}
OUT=${OUT:-output/dynamic3dgs}
CFG=${CFG:-fourdgs_tpu/configs/multipleview/default.py}
for scene in basketball boxes football juggle softball tennis; do
  python scripts/train.py -s "$DATA/$scene" -m "$OUT/$scene" \
    --configs "$CFG" --expname "dynamic3dgs/$scene"
  python scripts/render.py -m "$OUT/$scene" --skip_train
  python scripts/metrics.py -m "$OUT/$scene"
done
python scripts/read_all_metrics.py "$OUT"
