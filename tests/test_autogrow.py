"""Binner-cap auto-growth: a run that starts with overflowing caps must
grow them (one recompile per doubling) and finish drop-free — the static-cap
counterpart of the CUDA rasterizer's dynamic buffer resize
(ref submodule diff-gaussian-rasterization resizeFunctional usage)."""
import jax
import numpy as np
import pytest

from fourdgs_tpu.train import loop, optim, state as state_mod
from fourdgs_tpu.train.config import RasterParams
from tests.test_e2e_train import W, H, gt_data, smoke_config, true_scene

pytestmark = pytest.mark.slow


def test_autogrow_reaches_drop_free(gt_data):
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    # deliberately overflowing: 8 slots per 16x16 tile on an 80-gaussian
    # scene drops pairs immediately
    cfg.raster = RasterParams(capacity=4096, tile_size=16, tile_cap=8,
                              pair_cap=1 << 15, chunk=8,
                              bin_pairs_per_chunk=512)
    cfg.opt.densify_from_iter = 10**9   # keep the scene static
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 1024)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)

    res = loop.run_stage(cfg, st, "coarse", 120, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1), key=jax.random.key(2),
                         log_every=20)
    drops = [(h["iter"], h["dropped_pairs"], h["dropped_tile"],
              h["num_pairs"]) for h in res.history]
    assert drops[0][1] > 0 or drops[0][2] > 0, drops   # started overflowing
    # ended drop-free up to materiality: pair-budget drops must be exactly
    # zero; the tile counter is an any-unsaturated-pixel UPPER BOUND, so
    # growth stops once the residual is below the 0.5%-of-pairs threshold
    it, dp, dt, npairs = drops[-1]
    assert dp == 0, drops
    assert dt <= max(64, npairs // 200), drops


def test_autogrow_off_keeps_caps(gt_data):
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.raster = RasterParams(capacity=4096, tile_size=16, tile_cap=8,
                              pair_cap=1 << 15, chunk=8,
                              bin_pairs_per_chunk=512, autogrow=False)
    cfg.opt.densify_from_iter = 10**9
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 1024)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    res = loop.run_stage(cfg, st, "coarse", 40, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1), key=jax.random.key(2),
                         log_every=20)
    assert res.history[-1]["dropped_tile"] > 0   # still overflowing


def test_autoshrink_oversized_tile_cap(gt_data):
    """Oversized startup caps (e.g. a worst-case per-scene default) must
    shrink toward the measured true peak: every per-slot table carries the
    oversize for the whole run otherwise. Hysteresis (2.5x + cooldown)
    prevents grow/shrink oscillation."""
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.raster = RasterParams(capacity=4096, tile_size=16, tile_cap=2048,
                              pair_cap=1 << 15, chunk=8,
                              bin_pairs_per_chunk=512,
                              cap_shrink_spacing=100)
    cfg.opt.densify_from_iter = 10**9
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 1024)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)

    # shrink fires at guard syncs past the (test-shortened) cooldown
    res = loop.run_stage(cfg, st, "coarse", 300, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1),
                         key=jax.random.key(2), log_every=200)
    assert res.raster_cfg.tile_cap < 2048, res.raster_cfg.tile_cap
    # and the shrunk run stayed drop-free
    assert res.history[-1]["dropped_pairs"] == 0
    assert res.history[-1]["dropped_tile"] <= max(
        64, res.history[-1]["num_pairs"] // 200)
