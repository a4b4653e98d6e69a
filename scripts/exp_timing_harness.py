#!/usr/bin/env python
"""Validate device timing on the axon-tunneled TPU: block_until_ready
appears not to block, so force sync by pulling a dependent scalar to host.
Then re-measure the production gather/scatter costs both ways. (dev tool)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tsum(x):
    """Reduce any output pytree to a scalar on device."""
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit_host(name, fn, *args, iters=20):
    """Enqueue iters calls; force completion via host pull of a dependent
    scalar. Subtracts the (measured) pull latency."""
    s = float(tsum(fn(*args)))  # warmup incl. compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(tsum(out))        # depends on last out; stream is sequential
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:56s} {dt:9.3f} ms")
    return dt


def timeit_block(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:56s} {dt:9.3f} ms   [block_until_ready]")
    return dt


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    # --- harness calibration ---
    null = jax.jit(lambda x: x + 1.0)
    small = jnp.zeros((8,), jnp.float32)
    timeit_host("calib: tiny op (host-pull overhead/iter)", null, small,
                iters=50)

    big = jnp.ones((1 << 27,), jnp.float32)  # 512 MB
    f = jax.jit(lambda x: x * 1.5 + 1.0)
    timeit_host("sanity: 512MB elementwise (expect ~1.3ms)", f, big)
    timeit_block("sanity: 512MB elementwise", f, big)
    # linearity check
    timeit_host("sanity: 512MB elementwise iters=5", f, big, iters=5)
    timeit_host("sanity: 512MB elementwise iters=40", f, big, iters=40)
    del big

    w = 16
    nt_cap = 2500 * 768
    n = 100000
    rows = jnp.asarray(rng.normal(size=(nt_cap, w)).astype(np.float32))
    gidx = rng.integers(0, n, nt_cap).astype(np.int32)
    gidx[rng.random(nt_cap) < 0.78] = -1
    flat = jnp.asarray(gidx)

    def s_drop(r, f_):
        fi = jnp.where(f_ >= 0, f_, n)
        return jnp.zeros((n + 1, w), jnp.float32).at[fi].add(r, mode="drop")

    timeit_host("scatter 1.92M->100001 drop (synthetic idx)",
                jax.jit(s_drop), rows, flat)

    tblp = jnp.asarray(rng.normal(size=(n + 1, w)).astype(np.float32))

    def g_prod(t, f_):
        fi = jnp.where(f_ >= 0, f_, n)
        return t[fi]

    timeit_host("gather 1.92M from 100001 (synthetic idx)",
                jax.jit(g_prod), tblp, flat)

    big_tbl = jnp.asarray(rng.normal(size=(nt_cap, w)).astype(np.float32))
    dest = jnp.asarray(rng.integers(0, nt_cap, 819200).astype(np.int32))
    timeit_host("gather 819200 from 1.92M tbl", jax.jit(lambda t, i: t[i]),
                big_tbl, dest)

    # cumsum over pairs
    prows = jnp.asarray(rng.normal(size=(819200, w)).astype(np.float32))
    timeit_host("cumsum 819200 x 16 f32", jax.jit(
        lambda r: jnp.cumsum(r, axis=0)), prows)

    # now with REAL pipeline indices
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                                 bin_gaussians_count)
    n_points = 100_000
    size = 800
    cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                       tile_cap=768, chunk=32, bin_chunk=4096,
                       bin_pairs_per_chunk=32768)
    pts, cols = _synthetic_scene(n_points)
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.5, -4.0, (n_points, 3)),
                                 jnp.float32))
    quats = jnp.zeros((n_points, 4)).at[:, 0].set(1.0)
    camera = _look_at_camera()
    proj = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 16))(jnp.asarray(pts), scales, quats)
    binned = jax.jit(lambda pr: bin_gaussians_count(pr, cfg))(proj)
    real_gidx = jax.block_until_ready(binned.gidx)
    _ = float(tsum(real_gidx))

    timeit_host("scatter 1.92M->100001 drop (REAL gidx)",
                jax.jit(s_drop), rows, real_gidx.reshape(-1))
    timeit_host("gather 1.92M from 100001 (REAL gidx)",
                jax.jit(g_prod), tblp, real_gidx.reshape(-1))

    timeit_host("binner FULL (host sync)",
                jax.jit(lambda pr: bin_gaussians_count(pr, cfg)), proj)

    # blend fwd/bwd with host sync
    from fourdgs_tpu.ops.pallas import blend as pallas_blend
    from fourdgs_tpu.ops.rasterize_tiled import _tile_pixel_coords
    blend = pallas_blend.make_blend(cfg)
    px, py = _tile_pixel_coords(cfg)
    pix = jnp.asarray(rng.uniform(0, size, (n_points, 2)), jnp.float32)
    conic = jnp.tile(jnp.asarray([[0.5, 0.0, 0.5]], jnp.float32),
                     (n_points, 1))
    colsr = jnp.asarray(rng.uniform(0, 1, (n_points, 3)), jnp.float32)
    opac = jnp.full((n_points,), 0.5, jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 10, (n_points,)), jnp.float32)

    fwd = jax.jit(lambda g, *a: blend(g, px, py, *a))
    timeit_host("pallas blend fwd", fwd, real_gidx, pix, conic, colsr,
                opac, depth)

    def loss(g, *a):
        c, d, t = blend(g, px, py, *a)
        return (c.sum() + d.sum() + t.sum())
    grad = jax.jit(jax.grad(loss, argnums=(1, 2, 3, 4, 5)))
    timeit_host("pallas blend fwd+bwd (incl scatter)", grad, real_gidx,
                pix, conic, colsr, opac, depth)


if __name__ == "__main__":
    main()
