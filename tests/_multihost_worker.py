"""Worker process for tests/test_multihost.py: joins a 2-process CPU
cluster (4 virtual devices each -> 8 global), runs ONE sharded_train_step
over the ('data', 'tile') mesh with its host-local batch slice, and dumps
the loss + updated parameters for the driver test to compare."""
import os
import sys

# must be set before jax import: 4 local CPU devices per process
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from fourdgs_tpu.parallel.multihost import initialize_distributed
    ok = initialize_distributed(coordinator=coordinator, num_processes=2,
                               process_id=pid)
    assert ok and jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    from fourdgs_tpu.parallel import make_mesh
    from fourdgs_tpu.parallel import multihost
    from fourdgs_tpu.parallel.sharded import sharded_train_step
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.state import deform_config_from
    from tests.test_e2e_train import H, W, make_gt_data, smoke_config

    cams, images, true_means, true_colors = make_gt_data()
    cfg = smoke_config()
    rng = np.random.default_rng(0)
    pts = true_means + rng.normal(0, 0.05, true_means.shape).astype(np.float32)
    st = state_mod.create_state(jax.random.key(0), cfg, pts,
                                np.full_like(true_colors, 0.5),
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, 512)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, W, H)
    dcfg = deform_config_from(cfg)
    bg = jnp.zeros(3)

    # data axis = 2 crosses the two processes (DCN in production); tile
    # axis = 4 stays inside each process's local devices (ICI)
    mesh = make_mesh(2, 4)
    idxs = np.arange(4) % len(images)   # global batch of 4 -> 2 per host
    sl = multihost.host_batch_slice(len(idxs))
    local_cams = jax.tree.map(lambda a: np.asarray(a)[idxs[sl]], cams)
    local_gts = np.asarray(images)[idxs[sl]]
    g_cams, g_gts = multihost.global_batch((local_cams, local_gts), mesh)

    sh_state, loss, aux = sharded_train_step(
        st, g_cams, g_gts, bg, mesh=mesh, stage="coarse", active_sh=0,
        raster_cfg=rcfg, deform_cfg=dcfg, tx=tx,
        reg_weights=(0.01, 1e-4, 1e-4))

    out = {
        "loss": float(loss),
        "psnr": float(aux.psnr),
        "denom": np.asarray(sh_state.denom),
    }
    for name in ("xyz", "scaling", "opacity"):
        out[name] = np.asarray(getattr(sh_state.params["gauss"], name))
    np.savez(out_path, **out)
    print(f"worker {pid} done loss={out['loss']:.6f}")


if __name__ == "__main__":
    main()
