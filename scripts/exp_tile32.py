#!/usr/bin/env python
"""Measure pair counts + binner time at tile_size 16 vs 32 (dev tool)."""
import os, sys, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from _timing import timeit

def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, bin_gaussians_count
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config

    n_points = int(os.environ.get("PROF_POINTS", 100_000))
    size = 800
    cfg0 = Config()
    cap = 1 << (n_points - 1).bit_length()
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg0, pts, cols, spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    gauss = st.params["gauss"]
    camera = _look_at_camera()
    scales = jnp.exp(gauss.scaling)
    quats = gauss.rotation / jnp.linalg.norm(gauss.rotation, axis=-1, keepdims=True)
    opac = jax.nn.sigmoid(gauss.opacity[:, 0])

    for ts, tc in [(16, 768), (32, 1536), (32, 2048)]:
        proj = jax.jit(lambda p, s, q, o: project_gaussians(
            p, s, q, camera, size, size, ts, alive=st.alive, opacities=o))(
                gauss.xyz, scales, quats, opac)
        touched = np.asarray(proj.tiles_touched)
        vis = touched > 0
        c = RasterConfig(img_width=size, img_height=size, tile_size=ts,
                         tile_cap=tc, pair_cap=1 << 21, chunk=32)
        fn = jax.jit(lambda pr, c=c: bin_gaussians_count(pr, c))
        out = fn(proj)
        print(f"ts={ts} cap={tc}: pairs={touched.sum()} mean={touched[vis].mean():.2f} "
              f"dropped={int(out.dropped_pairs)}/{int(out.dropped_tile)} "
              f"max_tile={int(out.counts.max())} mean_tile={float(out.counts.mean()):.1f}",
              flush=True)
        timeit(f"binner ts={ts} cap={tc}", fn, proj, iters=10)

if __name__ == "__main__":
    main()
