#!/usr/bin/env python
"""Split timing of the Pallas blend path: attr pack/gather vs kernel."""
import functools
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
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms",
          flush=True)
    return out


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.pallas import blend as pb
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                                 _tile_pixel_coords,
                                                 bin_gaussians)

    n, size = 100_000, 800
    cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                       tile_cap=768, chunk=32, backend="pallas")
    pts, cols = _synthetic_scene(n)
    rng = np.random.default_rng(0)
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.5, -4.0, (n, 3)), jnp.float32))
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n), jnp.float32)
    colors = jnp.asarray(cols)
    camera = _look_at_camera()
    proj = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 16))(jnp.asarray(pts), scales, quats)
    binned = jax.jit(lambda pr: bin_gaussians(pr, cfg))(proj)
    px, py = _tile_pixel_coords(cfg)

    pack = jax.jit(lambda g, pr, c, o: pb._pack_attrs(
        g, pr.pix, pr.conic, c, o, pr.depth))
    attrs = timeit("pack_attrs (gather)", pack, binned.gidx, proj, colors,
                   opac)

    blend = pb.make_blend(cfg)
    # forward kernel only (pre-packed attrs)
    k = cfg.chunk
    p = cfg.pixels_per_tile
    fwd_kernel_only = jax.jit(lambda a, x, y: _raw_fwd(a, x, y, cfg))
    timeit("pallas fwd kernel only", fwd_kernel_only, attrs,
           px[:, None], py[:, None])

    full = jax.jit(lambda g, pr, c, o: blend(
        g, px, py, pr.pix, pr.conic, c, o, pr.depth))
    timeit("pallas blend full fwd", full, binned.gidx, proj, colors, opac)


def _raw_fwd(attrs, px3, py3, cfg):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fourdgs_tpu.ops.pallas import blend as pb
    k = cfg.chunk
    p = cfg.pixels_per_tile
    n_chunks = cfg.tile_cap // k
    t_blk = 8
    nt = attrs.shape[0]
    pad = (-nt) % t_blk
    attrs = jnp.pad(attrs, ((0, pad), (0, 0), (0, 0)))
    px3 = jnp.pad(px3, ((0, pad), (0, 0), (0, 0)))
    py3 = jnp.pad(py3, ((0, pad), (0, 0), (0, 0)))
    ntp = attrs.shape[0]
    out = pl.pallas_call(
        functools.partial(pb._fwd_kernel, k=k, n_chunks=n_chunks),
        grid=(ntp // t_blk, n_chunks),
        in_specs=[
            pl.BlockSpec((t_blk, k, pb.ATTR_W), lambda t, j: (t, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, 1, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, 1, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_blk, 3, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, 1, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_blk, 1, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntp, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((ntp, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((ntp, 1, p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_blk, 3, p), jnp.float32),
            pltpu.VMEM((t_blk, 1, p), jnp.float32),
            pltpu.VMEM((t_blk, 1, p), jnp.float32),
        ],
    )(attrs, px3, py3)
    return out[0]


if __name__ == "__main__":
    main()
