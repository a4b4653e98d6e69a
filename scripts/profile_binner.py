#!/usr/bin/env python
"""Micro-profile the counting binner's internal stages (dev tool)."""
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
    print(f"{name:32s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                                 bin_gaussians_count)

    n = int(os.environ.get("PROF_POINTS", 100_000))
    size = 800
    cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                       tile_cap=768, bin_chunk=2048, bin_pairs_per_chunk=16384)
    pts, cols = _synthetic_scene(n)
    rng = np.random.default_rng(0)
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.5, -4.0, (n, 3)), jnp.float32))
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    camera = _look_at_camera()
    proj = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 16))(jnp.asarray(pts), scales, quats)

    # 1. depth argsort alone
    vis = proj.tiles_touched > 0
    argsort_fn = jax.jit(lambda d: jnp.argsort(jnp.where(vis, d, jnp.inf)))
    timeit("depth argsort", argsort_fn, proj.depth)

    # 2. full count binner
    fullbin = jax.jit(lambda pr: bin_gaussians_count(pr, cfg))
    timeit("bin_gaussians_count", fullbin, proj)

    # 3. mask+cumsum scan only (no pair expansion / scatter)
    nt = cfg.num_tiles
    g = cfg.bin_chunk
    order = argsort_fn(proj.depth)
    rmin = proj.rect_min[order]
    rmax = proj.rect_max[order]
    n_chunks = -(-n // g)
    pad = n_chunks * g - n
    rmin = jnp.pad(rmin, ((0, pad), (0, 0)))
    rmax = jnp.pad(rmax, ((0, pad), (0, 0)))
    tx = (jnp.arange(nt, dtype=jnp.int32) % cfg.grid_x)[None, :]
    ty = (jnp.arange(nt, dtype=jnp.int32) // cfg.grid_x)[None, :]

    @jax.jit
    def scan_only(rmin, rmax):
        def body(c, i):
            lo = i * g
            a = jax.lax.dynamic_slice_in_dim(rmin, lo, g, 0)
            b = jax.lax.dynamic_slice_in_dim(rmax, lo, g, 0)
            m = ((tx >= a[:, 0:1]) & (tx < b[:, 0:1])
                 & (ty >= a[:, 1:2]) & (ty < b[:, 1:2]))
            colcum = jnp.cumsum(m.astype(jnp.int32), axis=0)
            return c + colcum[-1], None
        out, _ = jax.lax.scan(body, jnp.zeros((nt,), jnp.int32),
                              jnp.arange(n_chunks, dtype=jnp.int32))
        return out
    timeit("mask+cumsum scan only", scan_only, rmin, rmax)

    # 4. scatter cost alone: 16k unique scatters x n_chunks
    dest = jnp.asarray(rng.permutation(nt * cfg.tile_cap)[:16384], jnp.int32)
    vals = jnp.arange(16384, dtype=jnp.int32)

    @jax.jit
    def scatter_only(dest, vals):
        def body(buf, i):
            return buf.at[dest + i].set(vals, mode="drop",
                                        unique_indices=True), None
        buf = jnp.full((nt * cfg.tile_cap,), -1, jnp.int32)
        out, _ = jax.lax.scan(body, buf, jnp.arange(n_chunks, dtype=jnp.int32))
        return out
    timeit("scatter-only scan", scatter_only, dest, vals)

    # 5. gather cost: colcum[owner, t] 16k gathers x n_chunks
    owner = jnp.asarray(rng.integers(0, g, 16384), jnp.int32)
    tids = jnp.asarray(rng.integers(0, nt, 16384), jnp.int32)

    @jax.jit
    def gather_only(owner, tids):
        def body(c, i):
            m = ((tx >= 0) & (tx < 10) & (ty >= 0) & (ty < 10))
            m = jnp.broadcast_to(m, (g, nt))
            colcum = jnp.cumsum(m.astype(jnp.int32), axis=0)
            vals = colcum[owner, tids]
            return c + vals.sum(), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                              jnp.arange(n_chunks, dtype=jnp.int32))
        return out
    timeit("mask+cumsum+gather scan", gather_only, owner, tids)


if __name__ == "__main__":
    main()
