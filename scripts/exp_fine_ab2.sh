#!/bin/bash
# Fine-stage A/B wave 2: mechanism probes for the scale-deform fog runaway.
#   no_ds    — ablate scale deformation entirely (the runaway channel);
#              the synthetic scene's true motion is rigid translation, so
#              if this fixes convergence the mechanism is confirmed.
#   dssim    — lambda_dssim 0.25: D-SSIM penalizes structural blur far
#              harder than L1, an anti-fog restoring force.
#   dsdr     — no_ds + no_dr (positions-only deformation).
set -u
CKPT=output/synth_mv_r3/chkpnt_coarse_3000.npz
BASE="python scripts/train.py -s data/synth_mv --configs fourdgs_tpu/configs/dnerf/synth_mv.py \
  --start_checkpoint $CKPT --iterations 9000 \
  --test_iterations 2000 4000 6000 8000 9000 --save_iterations 2000 5000"

run() {
  name=$1; shift
  echo "=== AB $name: $* ==="
  rm -rf output/ab_$name
  $BASE -m output/ab_$name --expname ab_$name "$@" 2>&1 | grep -E "ITER|stage done|rolling"
}

run no_ds --no_ds
run dssim --lambda_dssim 0.25
run dsdr --no_ds --no_dr
echo "AB wave 2 done"
