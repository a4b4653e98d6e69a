#!/usr/bin/env python
"""Multi-chip scaling benchmark: sharded train-step throughput across mesh
shapes (the BASELINE.json north star asks >=80% scaling efficiency 1->N).

On a single-chip host this still runs (1,1) for the baseline row; on a pod
slice it sweeps the device count. Prints one JSON line per mesh shape.

BENCH_CPU_DEVICES=8 forces a virtual 8-device CPU mesh (the multi-chip
dryrun substrate) with a small operating point, so the data/tile-axis
sweep and its scaling efficiencies are at least exercised end-to-end on a
single-chip host. CPU efficiency numbers are indicative only — virtual
devices share the host's cores, so they measure communication/partition
overhead, not compute scaling.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_cpu_dev = int(os.environ.get("BENCH_CPU_DEVICES", 0))
if _cpu_dev:
    # FOURDGS_PLATFORM survives the axon sitecustomize (which clobbers
    # plain JAX_PLATFORMS while pre-registering the TPU plugin)
    os.environ["FOURDGS_PLATFORM"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={_cpu_dev}")
    os.environ.setdefault("BENCH_POINTS", "4096")
    os.environ.setdefault("BENCH_SIZE", "128")
    os.environ.setdefault("BENCH_STEPS", "5")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if _cpu_dev:
        from fourdgs_tpu.utils import jax_setup
        jax_setup.respect_platform_env()

    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.parallel.mesh import make_mesh
    from fourdgs_tpu.parallel.sharded import sharded_train_step
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points = int(os.environ.get("BENCH_POINTS", 100_000))
    size = int(os.environ.get("BENCH_SIZE", 800))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    n_dev = len(jax.devices())

    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cap = 1 << (n_points - 1).bit_length()
    cfg.raster = RasterParams(capacity=cap, tile_size=16, tile_cap=768,
                              chunk=32)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    raster_cfg = loop.raster_config_from(cfg, size, size)
    deform_cfg = deform_config_from(cfg)
    rng = np.random.default_rng(0)
    bg = jnp.zeros(3)

    shapes = [(1, 1)]
    n = 2
    while n <= n_dev:
        shapes.append((n, 1))
        if raster_cfg.num_tiles % n == 0:
            shapes.append((1, n))
        n *= 2

    base_rays = None
    for n_data, n_tile in shapes:
        mesh = make_mesh(n_data, n_tile)
        batch = max(n_data, 1)
        cams = [_look_at_camera(theta=0.3 + 0.1 * i, time=i / batch)
                for i in range(batch)]
        cameras = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        gts = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)),
                          jnp.float32)

        def step(state):
            return sharded_train_step(
                state, cameras, gts, bg, mesh=mesh, stage="fine",
                active_sh=3, raster_cfg=raster_cfg, deform_cfg=deform_cfg,
                tx=tx, reg_weights=(0.01, 1e-4, 1e-4))

        s, loss, _ = step(st)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        cur = st
        for _ in range(steps):
            cur, loss, _ = step(cur)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        rays = batch * size * size * steps / dt
        if base_rays is None:
            base_rays = rays
        eff = rays / (base_rays * n_data * n_tile)
        print(json.dumps({
            "mesh": f"{n_data}x{n_tile}",
            "rays_per_s": round(rays, 1),
            "steps_per_s": round(steps / dt, 3),
            "scaling_efficiency": round(eff, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
