"""run_stage over a mesh: the full stage driver (densify schedule included)
must work with the sharded train step."""
import jax
import numpy as np
import pytest

from fourdgs_tpu.parallel import make_mesh
from fourdgs_tpu.train import loop, optim, state as state_mod

from tests.test_e2e_train import H, W, gt_data, smoke_config

pytestmark = pytest.mark.slow


def test_run_stage_with_mesh(gt_data):
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.opt.batch_size = 2
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    mesh = make_mesh(2, 4)

    res = loop.run_stage(cfg, st, "coarse", 80, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1),
                         key=jax.random.key(2), log_every=40, mesh=mesh)
    psnrs = [h["psnr"] for h in res.history]
    assert np.isfinite(psnrs).all()
    assert psnrs[-1] > psnrs[0]


def test_collapse_guard_trips_under_mesh(gt_data):
    """Total visibility collapse (all gaussians culled, finite loss, zero
    grads) must trip the rollback guard on --mesh runs too — n_visible is
    wired through ShardedAux.visible (round-2 gap: the mesh branch built
    StepAux without it, leaving the guard inert)."""
    import jax.numpy as jnp

    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.opt.batch_size = 2
    st = state_mod.create_state(jax.random.key(0), cfg, true_means,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    # opacity logit -20 -> sigmoid ~ 2e-9 < ALPHA_MIN: the opacity-aware
    # culling zeroes every radius, so visible == 0 while alive > 0, the
    # render is pure background (loss FINITE, params NaN-free) and every
    # gradient is exactly zero — the frozen-forever signature
    g = st.params["gauss"]
    st = st._replace(params={
        **st.params,
        "gauss": g._replace(opacity=jnp.full_like(g.opacity, -20.0))})
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    mesh = make_mesh(2, 4)
    with pytest.raises(FloatingPointError, match="visibility collapse"):
        loop.run_stage(cfg, st, "coarse", 80, cams, images, tx, rcfg,
                       rng=np.random.default_rng(1), key=jax.random.key(2),
                       log_every=100, mesh=mesh)


def test_nan_guard_raises_without_good_state(gt_data):
    """Loss NaN on the first check with no good state must raise (the
    reference re-execs the process; we fail fast / roll back)."""
    import jax.numpy as jnp

    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.opt.batch_size = 1
    st = state_mod.create_state(jax.random.key(0), cfg, true_means,
                                true_colors, spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    bad = images.at[:].set(jnp.nan)
    # deterministically-bad data keeps failing every check; the guard rolls
    # back twice then gives up on the third consecutive non-finite check
    with pytest.raises(FloatingPointError):
        loop.run_stage(cfg, st, "coarse", 80, cams, bad, tx, rcfg,
                       rng=np.random.default_rng(1), key=jax.random.key(2),
                       log_every=100)


def test_densify_surgery_under_mesh(gt_data):
    """Surgery (clone/split + prune + bucket resize) must run INSIDE a
    mesh-driven stage and training must continue across it (VERDICT r3
    item 9: the surgery path was only ever exercised off-mesh)."""
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.opt.batch_size = 2
    cfg.opt.densify_from_iter = 10
    cfg.opt.densification_interval = 20
    cfg.opt.densify_until_iter = 200
    # threshold 0 forces clones/splits at the first boundary
    cfg.opt.densify_grad_threshold_coarse = 0.0
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    mesh = make_mesh(2, 4)
    n0 = int(st.alive.sum())

    res = loop.run_stage(cfg, st, "coarse", 60, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1),
                         key=jax.random.key(2), log_every=20, mesh=mesh)
    assert int(res.state.alive.sum()) > n0          # surgery grew the set
    assert np.isfinite([h["psnr"] for h in res.history]).all()
