#!/usr/bin/env python
"""Stage-by-stage rasterizer timing on the current backend (dev tool)."""
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
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1000:9.2f} ms")
    return dt


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.models.gaussians import create_from_points
    from fourdgs_tpu.ops import sh as sh_ops
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig, _make_blend,
                                                 _tile_pixel_coords,
                                                 bin_gaussians, rasterize)

    n = int(os.environ.get("PROF_POINTS", 100_000))
    size = int(os.environ.get("PROF_SIZE", 800))
    pair_cap = int(os.environ.get("PROF_PAIR_CAP", 1 << 21))
    tile_cap = int(os.environ.get("PROF_TILE_CAP", 768))
    chunk = int(os.environ.get("PROF_CHUNK", 32))
    cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                       tile_cap=tile_cap, pair_cap=pair_cap, chunk=chunk)
    print(f"points={n} size={size} pair_cap={pair_cap} tile_cap={tile_cap} "
          f"chunk={chunk} device={jax.devices()[0]}")

    pts, cols = _synthetic_scene(n)
    rng = np.random.default_rng(0)
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.5, -4.0, (n, 3)), jnp.float32))
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n), jnp.float32)
    colors = jnp.asarray(cols)
    camera = _look_at_camera()
    bg = jnp.zeros(3)

    proj_fn = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 16))
    proj = proj_fn(jnp.asarray(pts), scales, quats)
    timeit("projection", proj_fn, jnp.asarray(pts), scales, quats)

    bin_fn = jax.jit(lambda pr: bin_gaussians(pr, cfg))
    binned = bin_fn(proj)
    print(f"  pairs={int(binned.num_pairs)} "
          f"dropped={int(binned.dropped_pairs)}/{int(binned.dropped_tile)} "
          f"max_tile_count={int(binned.counts.max())} "
          f"mean={float(binned.counts.mean()):.1f}")
    timeit("binning (expand+sort+lists)", bin_fn, proj)

    blend = _make_blend(cfg)
    px, py = _tile_pixel_coords(cfg)
    blend_fn = jax.jit(lambda g, pr, c, o: blend(
        g, px, py, pr.pix, pr.conic, c, o, pr.depth))
    timeit("blend fwd", blend_fn, binned.gidx, proj, colors, opac)

    def loss(p, s, q, o, c):
        out = rasterize(p, s, q, o, c, camera, bg, cfg)
        return out.color.sum() + out.depth.sum()

    fwd = jax.jit(loss)
    timeit("full fwd", fwd, jnp.asarray(pts), scales, quats, opac, colors)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    timeit("full fwd+bwd", g, jnp.asarray(pts), scales, quats, opac, colors)

    # blend bwd in isolation
    def blend_loss(g_, pix, conic, c, o, d):
        ct, dt_, tt = blend(g_, px, py, pix, conic, c, o, d)
        return ct.sum() + dt_.sum() + tt.sum()
    bb = jax.jit(jax.grad(blend_loss, argnums=(1, 2, 3, 4, 5)))
    timeit("blend fwd+bwd", bb, binned.gidx, proj.pix, proj.conic, colors,
           opac, proj.depth)


if __name__ == "__main__":
    main()
