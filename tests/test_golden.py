"""Golden PSNR-trajectory regression (SURVEY §4(c)).

A fully deterministic few-hundred-step training run whose per-checkpoint
PSNR values are pinned against recorded goldens. Unlike the smoke
thresholds in test_e2e_train ("improves by 3 dB"), this catches SILENT
numeric drift anywhere in the pipeline — projection, binning order,
blend VJP, optimizer, densify surgery — long before it shows up as a
quality regression on a real scene.

Goldens were recorded on the CPU backend (the CI platform, pinned by
conftest) with scripts/record_golden.py; tolerance 0.35 dB absorbs
XLA-version reassociation noise while still flagging real changes.
Regenerate with: python scripts/record_golden.py
"""
import json
import os

import jax
import numpy as np
import pytest

from fourdgs_tpu.train import loop, optim, state as state_mod

from tests.test_e2e_train import H, W, gt_data, smoke_config

pytestmark = pytest.mark.slow

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "psnr_trajectory.json")
ATOL_DB = 0.35


def run_trajectory(gt_data):
    """Deterministic 240-step coarse + 160-step fine run; returns the
    PSNR trajectory sampled every 40 iterations per stage."""
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    rng = np.random.default_rng(0)
    pts = (true_means
           + rng.normal(0, 0.05, true_means.shape).astype(np.float32))
    cols = np.full_like(true_colors, 0.5)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 1024)
    rcfg = loop.raster_config_from(cfg, W, H)
    out = {}
    for stage, iters in (("coarse", 240), ("fine", 160)):
        tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
        st = st._replace(opt_state=tx.init(st.params))
        res = loop.run_stage(cfg, st, stage, iters, cams, images, tx, rcfg,
                             rng=np.random.default_rng(1),
                             key=jax.random.key(2), log_every=40)
        st = res.state
        out[stage] = {str(h["iter"]): round(float(h["psnr"]), 4)
                      for h in res.history}
    return out


def test_psnr_trajectory_matches_golden(gt_data):
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no golden file; run scripts/record_golden.py")
    golden = json.load(open(GOLDEN_PATH))
    got = run_trajectory(gt_data)
    for stage, checkpoints in golden.items():
        for it, want in checkpoints.items():
            have = got[stage][it]
            assert abs(have - want) <= ATOL_DB, (
                f"{stage} iter {it}: PSNR {have:.3f} vs golden "
                f"{want:.3f} (tol {ATOL_DB})\nfull: {got}")
