#!/usr/bin/env python
"""Decompose the full train step: deformation, SH, raster, optimizer."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms",
          flush=True)


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.models.deformation import deform_apply
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points = int(os.environ.get("PROF_POINTS", 100_000))
    size = 800
    cfg = Config()
    cap = 1 << (n_points - 1).bit_length()
    cfg.raster = RasterParams(capacity=cap, tile_size=16, tile_cap=768,
                              chunk=32)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    deform_cfg = deform_config_from(cfg)
    camera = _look_at_camera()
    raster_cfg = loop.raster_config_from(cfg, size, size)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)

    gauss = st.params["gauss"]
    shs = gauss.features()

    def deform_loss(dparams):
        out = deform_apply(dparams, deform_cfg, st.aabb, gauss.xyz,
                           gauss.scaling, gauss.rotation, gauss.opacity,
                           shs, jnp.float32(0.5))
        return sum(o.sum() for o in out)

    timeit("deform fwd", jax.jit(deform_loss), st.params["deform"])
    timeit("deform fwd+bwd", jax.jit(jax.grad(deform_loss)),
           st.params["deform"])

    def opt_update(params, opt_state):
        grads = jax.tree.map(jnp.ones_like, params)
        return tx.update(grads, opt_state, params)

    timeit("optimizer update", jax.jit(opt_update), st.params, st.opt_state)

    cameras = jax.tree.map(lambda x: x[None], camera)

    def full(state):
        return loop.train_step(
            state, cameras, gts, bg, stage="fine", active_sh=3,
            raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
            lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
            track_stats=True)

    timeit("FULL fine train step", jax.jit(full), st)

    def coarse(state):
        return loop.train_step(
            state, cameras, gts, bg, stage="coarse", active_sh=3,
            raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
            lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
            track_stats=True)

    timeit("FULL coarse train step", jax.jit(coarse), st)


if __name__ == "__main__":
    main()
