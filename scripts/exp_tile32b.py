#!/usr/bin/env python
"""Sweep slot budgets (bin_chunk, pairs_per_chunk) at tile 16/32 (dev tool)."""
import os, sys
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

    cases = [
        (16, 768, 4096, 32768),   # current default
        (16, 768, 4096, 16384),
        (16, 768, 8192, 32768),
        (32, 1536, 4096, 16384),
        (32, 1536, 4096, 8192),
        (32, 1536, 8192, 16384),
        (32, 1536, 8192, 32768),
        (32, 1536, 16384, 49152),
    ]
    projs = {}
    for ts in (16, 32):
        projs[ts] = jax.jit(lambda p, s, q, o, ts=ts: project_gaussians(
            p, s, q, camera, size, size, ts, alive=st.alive, opacities=o))(
                gauss.xyz, scales, quats, opac)
    for ts, tc, g, pc in cases:
        c = RasterConfig(img_width=size, img_height=size, tile_size=ts,
                         tile_cap=tc, pair_cap=1 << 21, chunk=32,
                         bin_chunk=g, bin_pairs_per_chunk=pc)
        fn = jax.jit(lambda pr, c=c: bin_gaussians_count(pr, c))
        out = fn(projs[ts])
        dt = timeit(f"ts={ts} g={g} pc={pc} slots={(cap//g)*pc//1024}k", fn,
                    projs[ts], iters=10)
        print(f"    dropped={int(out.dropped_pairs)}/{int(out.dropped_tile)}",
              flush=True)

if __name__ == "__main__":
    main()
