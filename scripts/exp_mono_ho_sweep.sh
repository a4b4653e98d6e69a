#!/bin/bash
# Held-out-PSNR sweep on data/synth_mono_ho (VERDICT r4 item 4): vary the
# levers that plausibly close the train/test gap — time-plane resolution
# (ref guidance: ~half the dynamic frames, ref arguments/__init__.py:92),
# smoothness/TV regularizer weights, grid LR — and SELECT ON HELD-OUT
# PSNR, not the train probe. Short schedule (3k+8k) for the sweep; the
# winner re-runs at the full 3k+20k.
set -u
run() {
  name=$1; cfgfile=$2
  echo "=== $name ==="
  python scripts/train.py -s data/synth_mono_ho --configs "$cfgfile" \
    -m "output/ho_$name" --expname "ho_$name" --iterations 8000 \
    --test_iterations 1000 2000 3000 4000 5000 6000 7000 8000 \
    --save_iterations 99999 2>&1 | tail -2
}
run control   fourdgs_tpu/configs/dnerf/synth_mono.py
run tres16    fourdgs_tpu/configs/dnerf/sweep/ho_tres16.py
run tres38    fourdgs_tpu/configs/dnerf/sweep/ho_tres38.py
run smooth10x fourdgs_tpu/configs/dnerf/sweep/ho_smooth10x.py
run gridlr4   fourdgs_tpu/configs/dnerf/sweep/ho_gridlr4.py
