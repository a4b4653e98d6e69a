#!/usr/bin/env python
"""Compare XLA vs Pallas blend on the current device (dev tool)."""
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
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")
    return out


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize

    n = int(os.environ.get("PROF_POINTS", 100_000))
    size = int(os.environ.get("PROF_SIZE", 800))
    chunk = int(os.environ.get("PROF_CHUNK", 32))
    tile_cap = int(os.environ.get("PROF_TILE_CAP", 768))
    pts, cols = _synthetic_scene(n)
    rng = np.random.default_rng(0)
    means = jnp.asarray(pts)
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.5, -4.0, (n, 3)), jnp.float32))
    quats = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, n), jnp.float32)
    colors = jnp.asarray(cols)
    camera = _look_at_camera()
    bg = jnp.zeros(3)

    outs = {}
    for backend in os.environ.get("PROF_BACKENDS", "xla,pallas").split(","):
        cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                           tile_cap=tile_cap, chunk=chunk, backend=backend)

        def fwd(m, s, q, o, c):
            return rasterize(m, s, q, o, c, camera, bg, cfg).color

        def loss(m, s, q, o, c):
            out = rasterize(m, s, q, o, c, camera, bg, cfg)
            return out.color.sum() + out.depth.sum()

        img = timeit(f"{backend} full fwd", jax.jit(fwd), means, scales,
                     quats, opac, colors)
        outs[backend] = np.asarray(img)
        timeit(f"{backend} full fwd+bwd",
               jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))),
               means, scales, quats, opac, colors)

    if "xla" in outs and "pallas" in outs:
        err = np.abs(outs["xla"] - outs["pallas"]).max()
        print(f"max |xla - pallas| image diff: {err:.2e}")


if __name__ == "__main__":
    main()
