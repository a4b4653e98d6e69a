"""ImageBank residency ladder: device / host(uint8) / lazy(decode-on-
demand) must produce identical batches, and the train loop must accept a
host-resident bank (the DyNeRF-scale streaming path, ref
scene/dataset.py:19-43 + train.py:89-94)."""
import numpy as np
import pytest

from fourdgs_tpu.data.scene import Scene, stack_cameras
from tests.test_data import write_blender_fixture


@pytest.fixture(scope="module")
def blender_infos(tmp_path_factory):
    root = tmp_path_factory.mktemp("bankdata")
    write_blender_fixture(root, n_frames=6, size=32)
    from fourdgs_tpu.data.blender import read_blender_scene
    info = read_blender_scene(str(root), white_background=True,
                              eval_split=True, resolution=(32, 32))
    return info.train_cameras


def test_modes_agree(blender_infos):
    dev = stack_cameras(blender_infos)
    host = stack_cameras(blender_infos, device_budget=0)
    lazy = stack_cameras(blender_infos, device_budget=0, host_budget=0)
    assert dev.images.mode == "device"
    assert host.images.mode == "host"
    assert lazy.images.mode == "lazy"
    assert dev.images.shape == host.images.shape == lazy.images.shape
    idxs = np.array([0, 3, 5])
    a = np.asarray(dev.images[idxs])
    b = np.asarray(host.images[idxs])
    c = np.asarray(lazy.images[idxs])
    # alpha-compositing makes values non-8-bit-exact; uint8 re-quantization
    # error is at most 1/510
    np.testing.assert_allclose(a, b, atol=0.002)
    np.testing.assert_allclose(a, c, atol=0.002)
    # scalar indexing (eval path)
    np.testing.assert_allclose(np.asarray(dev.images[3]),
                               np.asarray(host.images[3]), atol=0.002)
    assert len(lazy.images) == 6


def test_lazy_cache_bounded(blender_infos):
    lazy = stack_cameras(blender_infos, device_budget=0, host_budget=0)
    lazy.images._cache_size = 2
    for i in range(6):
        lazy.images[np.array([i])]
    assert len(lazy.images._cache) <= 2


def test_prefetch_agrees_and_drains(blender_infos):
    """prefetch(idxs) -> bank[idxs] returns the staged batch (identical to
    a cold read) and drains the pending table; unconsumed prefetches are
    bounded."""
    lazy = stack_cameras(blender_infos, device_budget=0, host_budget=0)
    bank = lazy.images
    idxs = np.array([1, 4])
    cold = np.asarray(bank[idxs])
    bank.prefetch(idxs)
    assert len(bank._pending) == 1
    warm = np.asarray(bank[idxs])
    np.testing.assert_array_equal(cold, warm)
    assert len(bank._pending) == 0
    # orphaned prefetches (batch order reshuffled) stay bounded
    for i in range(10):
        bank.prefetch(np.array([i % 6]))
    assert len(bank._pending) <= 4
    # device banks ignore prefetch
    dev = stack_cameras(blender_infos)
    dev.images.prefetch(idxs)


@pytest.mark.slow
def test_train_step_with_host_bank(blender_infos):
    """run_stage consumes a host bank exactly like a device array."""
    import jax

    from fourdgs_tpu.train import config as config_mod, loop, optim
    from fourdgs_tpu.train import state as state_mod

    host = stack_cameras(blender_infos, device_budget=0)
    cfg = config_mod.Config()
    cfg.raster.capacity = 512
    cfg.raster.tile_cap = 64
    cfg.raster.pair_cap = 8192
    cfg.raster.chunk = 8
    cfg.opt.batch_size = 2
    cfg.hidden.kplanes_config = {"grid_dimensions": 2,
                                 "input_coordinate_dim": 4,
                                 "output_coordinate_dim": 8,
                                 "resolution": [8, 8, 8, 4]}
    cfg.hidden.net_width = 16
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, host.width, host.height)
    res = loop.run_stage(cfg, st, "coarse", 6, host.cameras, host.images,
                         tx, rcfg, rng=np.random.default_rng(1),
                         key=jax.random.key(2), log_every=100)
    assert np.isfinite(res.history[-1]["loss"])
