"""Multi-chip tests on the virtual 8-device CPU mesh: the shard_map'd
training step must match the single-device step (loss and updated params),
validating the data x tile sharding and its gradient collectives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.parallel import make_mesh
from fourdgs_tpu.parallel.mesh import factor_devices
from fourdgs_tpu.parallel.sharded import sharded_train_step
from fourdgs_tpu.train import loop, optim, state as state_mod
from fourdgs_tpu.train.state import deform_config_from

from tests.test_e2e_train import (H, W, gt_data, look_at_cameras,
                                  smoke_config, true_scene)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(gt_data):
    cams, images, true_means, true_colors = gt_data
    cfg = smoke_config()
    cfg.opt.batch_size = 4
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    return cfg, st, tx, cams, images


def test_factor_devices():
    assert factor_devices(8) in [(4, 2), (2, 4)]
    assert factor_devices(1) == (1, 1)
    assert factor_devices(7) == (7, 1)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_sharded_matches_single_device(setup, mesh_shape):
    cfg, st, tx, cams, images = setup
    n_data, n_tile = mesh_shape
    mesh = make_mesh(n_data, n_tile)
    rcfg = loop.raster_config_from(cfg, W, H)
    dcfg = deform_config_from(cfg)
    bg = jnp.zeros(3)

    batch = 8  # divisible by all n_data choices
    idxs = np.arange(batch) % len(images)
    bc = jax.tree.map(lambda a: a[idxs], cams)
    gts = images[idxs]

    # single-device reference step
    ref_state, ref_aux = loop.train_step(
        st, bc, gts, bg, stage="coarse", active_sh=0, raster_cfg=rcfg,
        deform_cfg=dcfg, tx=tx, lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
        track_stats=True)

    sh_state, loss, aux = sharded_train_step(
        st, bc, gts, bg, mesh=mesh, stage="coarse", active_sh=0,
        raster_cfg=rcfg, deform_cfg=dcfg, tx=tx,
        reg_weights=(0.01, 1e-4, 1e-4))

    assert float(loss) == pytest.approx(float(ref_aux.l1), rel=1e-4)
    assert float(aux.psnr) == pytest.approx(float(ref_aux.psnr), rel=1e-3)
    # parameters after update must match
    for name in ("xyz", "scaling", "opacity"):
        a = np.asarray(getattr(ref_state.params["gauss"], name))
        b = np.asarray(getattr(sh_state.params["gauss"], name))
        np.testing.assert_allclose(b, a, atol=5e-5, err_msg=name)
    # densification stats must match
    np.testing.assert_allclose(np.asarray(sh_state.denom),
                               np.asarray(ref_state.denom))
    np.testing.assert_allclose(np.asarray(sh_state.xyz_gradient_accum),
                               np.asarray(ref_state.xyz_gradient_accum),
                               atol=1e-5)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_dssim_matches_single_device(setup, mesh_shape):
    """With lambda_dssim != 0 the sharded objective (all_gathered tiles ->
    full-image SSIM) must equal the single-device one, including grads."""
    cfg, st, tx, cams, images = setup
    n_data, n_tile = mesh_shape
    mesh = make_mesh(n_data, n_tile)
    rcfg = loop.raster_config_from(cfg, W, H)
    dcfg = deform_config_from(cfg)
    bg = jnp.zeros(3)

    idxs = np.arange(4) % len(images)
    bc = jax.tree.map(lambda a: a[idxs], cams)
    gts = images[idxs]

    ref_state, ref_aux = loop.train_step(
        st, bc, gts, bg, stage="coarse", active_sh=0, raster_cfg=rcfg,
        deform_cfg=dcfg, tx=tx, lambda_dssim=0.2,
        reg_weights=(0.01, 1e-4, 1e-4), track_stats=True)

    sh_state, loss, aux = sharded_train_step(
        st, bc, gts, bg, mesh=mesh, stage="coarse", active_sh=0,
        raster_cfg=rcfg, deform_cfg=dcfg, tx=tx,
        reg_weights=(0.01, 1e-4, 1e-4), lambda_dssim=0.2)

    assert float(loss) == pytest.approx(float(ref_aux.loss), rel=1e-4)
    for name in ("xyz", "scaling", "opacity", "rotation"):
        a = np.asarray(getattr(ref_state.params["gauss"], name))
        b = np.asarray(getattr(sh_state.params["gauss"], name))
        np.testing.assert_allclose(b, a, atol=5e-5, err_msg=name)


def test_sharded_eval_render_matches_single_device(setup):
    from fourdgs_tpu.parallel.sharded import sharded_eval_render
    cfg, st, tx, cams, images = setup
    mesh = make_mesh(2, 4)
    rcfg = loop.raster_config_from(cfg, W, H)
    dcfg = deform_config_from(cfg)
    bg = jnp.zeros(3)
    cam = jax.tree.map(lambda a: a[0], cams)

    ref = loop.eval_step(st, cam, bg, stage="fine", active_sh=0,
                         raster_cfg=rcfg, deform_cfg=dcfg)
    color, depth, alpha = sharded_eval_render(
        st, cam, bg, mesh=mesh, raster_cfg=rcfg, deform_cfg=dcfg,
        stage="fine", active_sh=0)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               atol=2e-4)


def test_sharded_fine_stage_runs(setup):
    cfg, st, tx, cams, images = setup
    mesh = make_mesh(2, 4)
    rcfg = loop.raster_config_from(cfg, W, H)
    dcfg = deform_config_from(cfg)
    idxs = np.arange(2)
    bc = jax.tree.map(lambda a: a[idxs], cams)
    sh_state, loss, aux = sharded_train_step(
        st, bc, images[idxs], jnp.zeros(3), mesh=mesh, stage="fine",
        active_sh=0, raster_cfg=rcfg, deform_cfg=dcfg, tx=tx,
        reg_weights=(0.01, 1e-4, 1e-4))
    assert np.isfinite(float(loss))
    # fine stage loss includes regularizers -> larger than plain l1
    assert float(loss) >= float(aux.l1)
