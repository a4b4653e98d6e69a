#!/usr/bin/env python
"""Round-4 knob sweep at the bench operating point (100k pts, 800px).

Times the full train step for a handful of RasterParams knob combos and
reports the binner overflow counters for each (a faster combo that drops
pairs is not admissible — quality runs must stay drop-free)."""
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
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points, size = 100_000, 800
    cap = 131072
    pts, cols = _synthetic_scene(n_points)

    combos = [
        ("control t32 cap512 bc4096 pc16384 ch32", dict()),
        ("pc 8192", dict(bin_pairs_per_chunk=8192)),
        ("bc8192 pc32768", dict(bin_chunk=8192, bin_pairs_per_chunk=32768)),
        ("chunk 64", dict(chunk=64)),
        ("tile_cap 384", dict(tile_cap=384)),
        ("tile_cap 320", dict(tile_cap=320)),
        ("tile_cap 256", dict(tile_cap=256)),
        ("pc8192 + tile_cap 384", dict(bin_pairs_per_chunk=8192,
                                       tile_cap=384)),
    ]
    names = sys.argv[1:]
    if names:
        combos = [c for c in combos if any(n in c[0] for n in names)]

    for name, kw in combos:
        cfg = Config()
        cfg.hidden.multires = [1, 2]
        cfg.hidden.defor_depth = 0
        cfg.hidden.net_width = 64
        base = dict(capacity=cap, tile_size=32, tile_cap=512,
                    pair_cap=1 << 21, chunk=32, backend="auto",
                    bin_chunk=4096, bin_pairs_per_chunk=16384)
        base.update(kw)
        cfg.raster = RasterParams(**base)
        st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                    spatial_lr_scale=1.0)
        st = loop.compact_and_resize(st, cap)
        tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
        st = st._replace(opt_state=tx.init(st.params))
        raster_cfg = loop.raster_config_from(cfg, size, size)
        deform_cfg = deform_config_from(cfg)
        camera = _look_at_camera()
        cameras = jax.tree.map(lambda x: x[None], camera)
        rng = np.random.default_rng(0)
        gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
        bg = jnp.zeros(3)

        def step(state):
            return loop.train_step(
                state, cameras, gts, bg, stage="fine", active_sh=3,
                raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
                lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
                track_stats=True)

        st2, aux = step(st)
        jax.block_until_ready(aux.loss)
        for _ in range(3):
            st2, aux = step(st2)
        jax.block_until_ready(aux.loss)
        steps = 15
        t0 = time.perf_counter()
        for _ in range(steps):
            st2, aux = step(st2)
        jax.block_until_ready(aux.loss)
        dt = (time.perf_counter() - t0) / steps * 1000
        dp = int(aux.dropped_pairs)
        dtile = int(aux.dropped_tile)
        rays = size * size / (dt / 1000)
        print(f"{name:44s} {dt:7.2f} ms  {rays/1e6:6.2f}M rays/s  "
              f"drops pair={dp} tile={dtile}", flush=True)


if __name__ == "__main__":
    main()
