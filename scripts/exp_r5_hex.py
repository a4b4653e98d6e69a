#!/usr/bin/env python
"""In-situ cost of the hexplane grid backward: full bench step vs the same
step with stop_gradient on (a) spatial planes, (b) all grid planes.
30-iter loop, one hard sync (axon timing caveat)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.models.hexplane import SPACE_PLANES, TIME_PLANES
    from fourdgs_tpu.ops import losses
    from fourdgs_tpu.render.render import render
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points, size = 100_000, 800
    cap = 131072
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cfg.raster = RasterParams(capacity=cap, tile_size=32, tile_cap=512,
                              pair_cap=1 << 21, chunk=32,
                              bin_pairs_per_chunk=18432)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    gauss = st.params["gauss"]._replace(
        opacity=jnp.full_like(st.params["gauss"].opacity, 2.197))
    st = st._replace(params={**st.params, "gauss": gauss})
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    raster_cfg = loop.raster_config_from(cfg, size, size)
    deform_cfg = deform_config_from(cfg)
    camera = _look_at_camera()
    cameras = jax.tree.map(lambda x: x[None], camera)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)

    def make_step(stop_planes=()):
        def stop_grids(params):
            if not stop_planes:
                return params
            grid = dict(params["deform"]["grid"])
            for k in list(grid):
                if any(f"_p{ci}" in k for ci in stop_planes):
                    grid[k] = jax.lax.stop_gradient(grid[k])
            deform = dict(params["deform"])
            deform["grid"] = grid
            return {**params, "deform": deform}

        @jax.jit
        def step(s):
            def loss_fn(params):
                params = stop_grids(params)
                out = render(params["gauss"], params["deform"],
                             jax.tree.map(lambda x: x[0], cameras), bg,
                             raster_cfg, deform_cfg, s.aabb, s.alive, 3,
                             stage="fine")
                return losses.l1_loss(out.color[None], gts)
            l, g = jax.value_and_grad(loss_fn)(s.params)
            updates, opt_state = tx.update(g, s.opt_state, s.params)
            import optax
            params = optax.apply_updates(s.params, updates)
            return s._replace(params=params, opt_state=opt_state), l
        return step

    def bench(name, fn, iters=30):
        s = st
        s, l = fn(s)
        float(l)
        for _ in range(3):
            s, l = fn(s)
        float(l)
        t0 = time.perf_counter()
        for _ in range(iters):
            s, l = fn(s)
        float(l)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:42s} {dt:8.2f} ms/step", flush=True)
        return dt

    t_full = bench("full step", make_step())
    t_nospace = bench("stop_grad spatial planes", make_step(SPACE_PLANES))
    t_nogrid = bench("stop_grad ALL planes",
                     make_step(tuple(SPACE_PLANES) + tuple(TIME_PLANES)))
    print(f"\nspatial-plane backward : {t_full - t_nospace:6.2f} ms")
    print(f"time-plane backward    : {t_nospace - t_nogrid:6.2f} ms")


if __name__ == "__main__":
    main()
