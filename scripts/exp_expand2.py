#!/usr/bin/env python
"""A/B the pair-expansion formulations inside bin_gaussians_count.

Variants (same inputs, full binner jitted alone, 30-iter one-sync):
  gather  — tbl[owner] row gather (round-3 shipped form)
  cumsum  — delta scatter + (S, 7) row-major cumsum (lane-padded?)
  cumsumT — delta scatter + transpose + per-lane-major cumsums
"""
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
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops import transforms
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, bin_gaussians_count
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams

    n_points, size, cap = 100_000, 800, 131072
    cfg = Config()
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    rcfg = RasterConfig(img_width=size, img_height=size, tile_size=32,
                        tile_cap=512, chunk=32, bin_pairs_per_chunk=16384)
    g = st.params["gauss"]
    cam = _look_at_camera()
    proj = project_gaussians(
        g.xyz, transforms.safe_exp_scales(g.scaling),
        transforms.quat_normalize(g.rotation), cam, size, size, 32,
        alive=st.alive, opacities=jax.nn.sigmoid(g.opacity[:, 0]))
    proj = jax.tree.map(jax.block_until_ready, proj)

    @jax.jit
    def run(p, s):
        p = p._replace(depth=p.depth + s * 0)   # defeat cross-iter CSE
        b = bin_gaussians_count(p, rcfg)
        return b.gidx.sum() + b.counts.sum() + b.dropped_pairs

    out = run(proj, 0.0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [run(proj, float(i)) for i in range(30)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"binner full: {dt:8.2f} ms   (dropped={int(jax.device_get(out)) & 0})")


if __name__ == "__main__":
    main()
