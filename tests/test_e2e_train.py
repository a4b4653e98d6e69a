"""End-to-end training smoke tests on a synthetic scene.

Golden-trajectory style QA (SURVEY.md §4): ground-truth images are rendered
from a known Gaussian scene; training from a perturbed init must recover a
much higher PSNR within a few hundred steps, through the full jitted step
(render -> loss -> backward -> adam -> densify schedule).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.data.camera import make_camera
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize
from fourdgs_tpu.train import loop, optim, state as state_mod
from fourdgs_tpu.train.config import Config, RasterParams

pytestmark = pytest.mark.slow

W, H = 64, 64
N_TRUE = 80


def look_at_cameras(n_views, radius=5.0, time_fn=None):
    """Ring of cameras looking at the origin."""
    cams = []
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        pos = np.array([radius * np.sin(theta), 0.3, radius * np.cos(theta)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R_w2c = np.stack([right, true_up, fwd])   # rows: camera axes
        R = R_w2c.T                               # reference convention
        T = -R_w2c @ pos
        t = time_fn(i) if time_fn else 0.0
        cams.append(make_camera(R, T, 0.8, 0.8, time=t))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def true_scene(rng):
    means = rng.uniform(-0.8, 0.8, (N_TRUE, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-2.5, -1.5, (N_TRUE, 3))).astype(np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (N_TRUE, 1))
    opac = rng.uniform(0.6, 0.95, N_TRUE).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (N_TRUE, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))


def smoke_config():
    cfg = Config()
    cfg.model.sh_degree = 1
    cfg.model.white_background = False
    cfg.raster = RasterParams(capacity=4096, tile_size=16, tile_cap=256,
                              pair_cap=1 << 15, chunk=8)
    cfg.hidden.kplanes_config["resolution"] = [16, 16, 16, 8]
    cfg.hidden.kplanes_config["output_coordinate_dim"] = 8
    cfg.hidden.multires = [1, 2]
    cfg.hidden.net_width = 32
    cfg.opt.batch_size = 2
    cfg.opt.densify_from_iter = 40
    cfg.opt.densification_interval = 60
    cfg.opt.densify_until_iter = 220
    cfg.opt.opacity_reset_interval = 100000
    cfg.opt.pruning_from_iter = 100000
    return cfg


def make_gt_data():
    """Deterministic ground-truth scene + rendered images (plain function
    so multi-process workers can rebuild the identical data)."""
    rng = np.random.default_rng(5)
    cams = look_at_cameras(10)
    means, scales, quats, opac, colors = true_scene(rng)
    rcfg = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=256,
                        pair_cap=1 << 15, chunk=8)
    bg = jnp.zeros(3)

    def render_one(cam):
        return rasterize(means, scales, quats, opac, colors, cam, bg,
                         rcfg).color

    images = jax.vmap(render_one)(cams)
    return cams, images, np.asarray(means), np.asarray(colors)


@pytest.fixture(scope="module")
def gt_data():
    return make_gt_data()


def test_coarse_training_improves_psnr(gt_data):
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    rng = np.random.default_rng(0)
    # init: true points + noise, wrong colors
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    cols = np.full_like(true_colors, 0.5)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 1024)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)

    history = []
    res = loop.run_stage(cfg, st, "coarse", 250, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1), key=jax.random.key(2),
                         log_every=50, log_fn=history.append)
    psnrs = [h["psnr"] for h in res.history]
    assert psnrs[-1] > psnrs[0] + 3.0, psnrs
    assert psnrs[-1] > 22.0, psnrs


def test_fine_stage_runs_and_improves(gt_data):
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.03, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 1024)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)

    res = loop.run_stage(cfg, st, "fine", 120, cams, images, tx, rcfg,
                         rng=np.random.default_rng(1), key=jax.random.key(2),
                         log_every=40)
    psnrs = [h["psnr"] for h in res.history]
    assert np.isfinite(psnrs).all()
    assert psnrs[-1] > psnrs[0] + 1.0, psnrs
