"""Regression tests for the contribution-collapse guard (VERDICT r3 weak #2).

Reproduces the synth_mv_r3 failure signature: gaussians that still PROJECT
(positive radii, so the old n_visible probe reads healthy) but whose alpha
at every pixel CENTER sits below the 1/255 compositing gate. The blend then
composites nothing, the loss is finite, every photometric gradient is
exactly zero, and without the max_alpha guard training would freeze
forever (synth_mv_r3 trained frozen for 9k iterations with
n_visible == 23k).

Construction: with the identity camera, a point at (0, 0, z) projects to
pixel ((W-1)/2, (H-1)/2) — EXACTLY between four pixel centers (distance
sqrt(0.5) px). A sub-lowpass-size gaussian there has 2D sigma^2 ~= LOWPASS
(0.3), so alpha at the nearest center is op * exp(-0.25 / 0.3) ~= 0.435 op;
op = 0.008 puts that at 0.0035 < 1/255 while op itself stays above the
projection cull (op > 1/255 keeps radius > 0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.data.camera import make_camera
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize
from fourdgs_tpu.ops.transforms import inverse_sigmoid
from fourdgs_tpu.train import loop, optim, state as state_mod
from fourdgs_tpu.train.state import deform_config_from
from tests.test_e2e_train import smoke_config

pytestmark = pytest.mark.slow

W, H = 64, 64
OP = 0.008
RCFG = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=256,
                    pair_cap=1 << 15, chunk=8)


def _identity_camera():
    return make_camera(np.eye(3), np.zeros(3), 1.0, 1.0)


def test_render_visible_but_fully_gated():
    """The raw signature: radii > 0 (old probe healthy) yet alpha == 0."""
    cam = _identity_camera()
    out = rasterize(jnp.array([[0.0, 0.0, 4.0]]),
                    jnp.full((1, 3), 1e-4),
                    jnp.array([[1.0, 0, 0, 0]]),
                    jnp.array([OP]), jnp.full((1, 3), 0.7), cam,
                    jnp.zeros(3), RCFG)
    assert int(out.radii[0]) > 0
    assert bool(out.visibility[0])
    assert float(out.alpha.max()) == 0.0


def _gated_state(cfg):
    pts = np.array([[0.0, 0.0, 4.0]], np.float32)
    cols = np.full((1, 3), 0.5, np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 256)
    gauss = st.params["gauss"]
    op = jnp.full_like(gauss.opacity, float(inverse_sigmoid(OP)))
    scal = jnp.full_like(gauss.scaling, float(np.log(1e-4)))
    params = dict(st.params)
    params["gauss"] = gauss._replace(opacity=op, scaling=scal)
    return st._replace(params=params)


def _setup(cfg):
    st = _gated_state(cfg)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    return st, tx, loop.raster_config_from(cfg, W, H)


def test_max_alpha_zero_but_visible_in_step_aux():
    cfg = smoke_config()
    st, tx, rcfg = _setup(cfg)
    cam = jax.tree.map(lambda x: jnp.asarray(x)[None], _identity_camera())
    gt = jnp.full((1, H, W, 3), 0.3, jnp.float32)
    _, aux = loop.train_step(
        st, cam, gt, jnp.zeros(3), jnp.int32(0), stage="coarse",
        raster_cfg=rcfg, deform_cfg=deform_config_from(cfg), tx=tx,
        lambda_dssim=0.0, reg_weights=(0.0, 0.0, 0.0))
    assert float(aux.max_alpha) == 0.0
    assert int(aux.n_visible) > 0   # the old radii probe would NOT fire


def test_run_stage_trips_on_contribution_collapse():
    cfg = smoke_config()
    cfg.opt.batch_size = 1
    cfg.opt.densify_from_iter = 10**9   # isolate the guard from surgery
    st, tx, rcfg = _setup(cfg)
    cams = jax.tree.map(lambda x: jnp.asarray(x)[None], _identity_camera())
    images = jnp.full((1, H, W, 3), 0.3, jnp.float32)
    with pytest.raises(FloatingPointError, match="contribution collapse"):
        loop.run_stage(cfg, st, "coarse", 100, cams, images, tx, rcfg,
                       rng=np.random.default_rng(1), key=jax.random.key(2),
                       log_every=1000)
