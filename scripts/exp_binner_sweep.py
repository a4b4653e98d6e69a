#!/usr/bin/env python
"""Sweep the two-tier binner's (span_cap, tier-B budget) on TPU (dev tool).

Also times the binner's internal pieces (argsort, tier-A expansion, tier-B
owner machinery, scan, final scatter) to locate the milliseconds.
"""
import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                                 bin_gaussians_count)
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config

    n_points = int(os.environ.get("PROF_POINTS", 100_000))
    size = int(os.environ.get("PROF_SIZE", 800))
    cfg0 = Config()
    cap = 1 << (n_points - 1).bit_length()
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg0, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    gauss = st.params["gauss"]
    camera = _look_at_camera()
    scales = jnp.exp(gauss.scaling)
    quats = gauss.rotation / jnp.linalg.norm(gauss.rotation, axis=-1,
                                             keepdims=True)
    opac = jax.nn.sigmoid(gauss.opacity[:, 0])
    proj = jax.jit(lambda p, s, q, o: project_gaussians(
        p, s, q, camera, size, size, 16, alive=st.alive, opacities=o))(
            gauss.xyz, scales, quats, opac)

    touched = np.asarray(proj.tiles_touched)
    vis = touched > 0
    print(f"visible={vis.sum()} pairs={touched.sum()} "
          f"mean_touched={touched[vis].mean():.2f} "
          f"p50={np.percentile(touched[vis], 50):.0f} "
          f"p90={np.percentile(touched[vis], 90):.0f} "
          f"p99={np.percentile(touched[vis], 99):.0f} "
          f"max={touched.max()}", flush=True)

    base = RasterConfig(img_width=size, img_height=size, tile_size=16,
                        tile_cap=768, pair_cap=1 << 21, chunk=32)
    for k1, pcb, g in [(16, 8192, 4096), (8, 8192, 4096), (8, 16384, 4096),
                       (4, 16384, 4096), (4, 24576, 4096), (8, 16384, 8192),
                       (2, 24576, 4096)]:
        c = dataclasses.replace(base, span_cap=k1, bin_pairs_per_chunk=pcb,
                                bin_chunk=g)
        fn = jax.jit(lambda pr, c=c: bin_gaussians_count(pr, c))
        out = fn(proj)
        dt = timeit(f"bin k1={k1} pcb={pcb} g={g}", fn, proj, iters=10)
        print(f"    dropped_budget+tile={int(out.dropped_pairs)}/"
              f"{int(out.dropped_tile)}", flush=True)


if __name__ == "__main__":
    main()
