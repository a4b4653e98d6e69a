#!/usr/bin/env python
"""Isolated counting-binner timing at the bench operating point (30-iter
loop, one hard sync — see the timing caveat in .claude/skills/verify)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                                 bin_gaussians_count)
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config

    n = int(os.environ.get("PROF_POINTS", 100_000))
    size = 800
    cap = 1 << (n - 1).bit_length()
    cfg = Config()
    pts, cols = _synthetic_scene(n)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    g = st.params["gauss"]
    tile = int(os.environ.get("PROF_TILE", 32))
    rc = RasterConfig(
        img_width=size, img_height=size, tile_size=tile,
        tile_cap=int(os.environ.get("PROF_TILE_CAP", 256)),
        pair_cap=1 << 21, chunk=32,
        bin_chunk=int(os.environ.get("PROF_BIN_CHUNK", 4096)),
        bin_pairs_per_chunk=int(os.environ.get("PROF_BIN_PC", 16384)))
    cam = _look_at_camera()

    @jax.jit
    def run(xyz):
        proj = project_gaussians(
            xyz, jnp.exp(g.scaling),
            g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True),
            cam, size, size, tile, alive=st.alive)
        b = bin_gaussians_count(proj, rc)
        # loop-carried dependency so iterations serialize
        return xyz + 1e-12 * b.counts.sum().astype(jnp.float32)

    x = g.xyz
    x = run(x)
    np.asarray(x[0])
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        x = run(x)
    np.asarray(x[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"proj+binner: {dt:.2f} ms/iter  (tile={tile} cap={rc.tile_cap} "
          f"g={rc.bin_chunk} pc={rc.bin_pairs_per_chunk})")


if __name__ == "__main__":
    main()
