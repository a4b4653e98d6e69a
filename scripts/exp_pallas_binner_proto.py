#!/usr/bin/env python
"""Prototype: serial Pallas expansion+rank kernel rate measurement.

Replaces the XLA binner's pair expansion + coverage-mask scan: for each
depth-ordered gaussian (SMEM-blocked rect data), walk its covered tile
rect with nested dynamic loops; per pair, bump the tile's SMEM counter and
write (dest, gid) to the chunk's slot rows (dynamic VMEM row store at the
gaussian's precomputed slot0 offset). Output is (n_chunks, pc, 8) i32 —
the same (dest, oidx) stream the XLA scan emits for the final scatter.

Measures pairs/s against the real-shape XLA reference
(100k pts, 800px, tile 32 -> 625 tiles, ~0.5M pairs).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(g, pc, n_chunks, nt, grid_x, tile_cap):
    def kernel(x0_ref, y0_ref, sx_ref, sy_ref, slot0_ref, gid_ref,
               out_ref, cnt_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            def zero(t, _):
                cnt_ref[t] = 0
                return 0
            jax.lax.fori_loop(0, nt + 8, zero, 0)

        def per_gauss(i, _):
            x0 = x0_ref[0, 0, i]
            y0 = y0_ref[0, 0, i]
            sx = sx_ref[0, 0, i]
            sy = sy_ref[0, 0, i]
            s0 = slot0_ref[0, 0, i]
            gid = gid_ref[0, 0, i]

            def per_pair(j, _):
                dx = j % sx
                dy = j // sx
                t = (y0 + dy) * grid_x + x0 + dx
                rank = cnt_ref[t]
                cnt_ref[t] = rank + 1
                dest = jnp.where((rank < tile_cap) & (s0 + j < pc),
                                 t * tile_cap + rank, nt * tile_cap)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                row = jnp.where(lane == 0, dest,
                                jnp.where(lane == 1, gid, 0))
                @pl.when(s0 + j < pc)
                def _store():
                    out_ref[0, pl.ds(s0 + j, 1), :] = row
                return 0

            jax.lax.fori_loop(0, sx * sy, per_pair, 0)
            return 0

        jax.lax.fori_loop(0, g, per_gauss, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, 1, g), lambda c: (c, 0, 0),
                               memory_space=pltpu.SMEM)] * 6,
        out_specs=pl.BlockSpec((1, pc, 8), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((nt + 8,), jnp.int32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, pc, 8), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )


def main():
    from _timing import sync

    rng = np.random.default_rng(0)
    n, g, pc, nt, grid_x, tile_cap = 131072, 4096, 16384, 625, 25, 1536
    n_chunks = n // g
    # synthetic rects resembling the bench distribution: ~4 tiles/gaussian
    sx = rng.integers(1, 4, n).astype(np.int32)
    sy = rng.integers(1, 4, n).astype(np.int32)
    x0 = rng.integers(0, 22, n).astype(np.int32)
    y0 = rng.integers(0, 22, n).astype(np.int32)
    touched = (sx * sy).astype(np.int32)
    total = int(touched.sum())
    # per-chunk slot0
    off = np.concatenate([[0], np.cumsum(touched)])[:-1]
    chunk_start = off[::g]
    slot0 = (off - np.repeat(chunk_start, g)).astype(np.int32)
    gid = np.arange(n, dtype=np.int32)

    def shape(a):
        return jnp.asarray(a.reshape(n_chunks, 1, g))

    fn = jax.jit(make_kernel(g, pc, n_chunks, nt, grid_x, tile_cap))
    args = [shape(a) for a in (x0, y0, sx, sy, slot0, gid)]
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"pairs {total/1e3:.0f}k  kernel {dt*1000:.2f} ms  "
          f"rate {total/dt/1e6:.0f}M pairs/s")


if __name__ == "__main__":
    main()
