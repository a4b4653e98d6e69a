#!/bin/bash
# Fine-stage A/B wave 3: soft-bounded deformation deltas (the intervention
# against the white-collapse runaway: spatial-plane magnitude spikes ->
# e^4 scale deltas -> all opacity killed). Variants:
#   zb   — zerostamp coarse + bounds (dx 2.0 world, ds 1.0 log, dr 1.0)
#   zbd  — zb + lambda_dssim 0.25 (anti-blur restoring force)
#   nods — blurry coarse ckpt + no_ds (mechanism probe: scale-channel off)
set -u
CFG=fourdgs_tpu/configs/dnerf/synth_mv.py
BOUNDS="--deform_dx_bound 2.0 --deform_ds_bound 1.0 --deform_dr_bound 1.0"

run() {
  name=$1; shift
  echo "=== AB3 $name: $* ==="
  rm -rf output/ab3_$name
  python scripts/train.py -s data/synth_mv -m output/ab3_$name \
    --configs $CFG --expname ab3_$name --iterations 9000 \
    --test_iterations 1000 3000 5000 7000 9000 --save_iterations 9000 \
    "$@" 2>&1 | grep -E "ITER|stage done|rolling"
}

run zb --zerostamp_init $BOUNDS
run zbd --zerostamp_init $BOUNDS --lambda_dssim 0.25
run nods --no_ds --start_checkpoint output/synth_mv_r3/chkpnt_coarse_3000.npz
echo "AB wave 3 done"
