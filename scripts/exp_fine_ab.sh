#!/bin/bash
# Fine-stage A/B sweep on data/synth_mv from the shared coarse-3000
# checkpoint: isolate what stops the observed 23 dB -> 16.5 dB decay
# (grid magnitude runaway + post-reset opacity lock-in).
set -u
CKPT=output/synth_mv_r3/chkpnt_coarse_3000.npz
BASE="python scripts/train.py -s data/synth_mv --configs fourdgs_tpu/configs/dnerf/synth_mv.py \
  --start_checkpoint $CKPT --iterations 9000 \
  --test_iterations 2000 4000 6000 8000 9000 --save_iterations 99999"

run() {
  name=$1; shift
  echo "=== AB $name: $* ==="
  rm -rf output/ab_$name
  $BASE -m output/ab_$name --expname ab_$name "$@" 2>&1 | grep -E "ITER|fine .*loss|stage done|rolling"
}

run control
run noreset --opacity_reset_interval 1000000
run l1anchor --l1_time_planes 0.01
run gridlr4 --grid_lr_init 0.0004 --grid_lr_final 0.000004
echo "AB sweep done"
