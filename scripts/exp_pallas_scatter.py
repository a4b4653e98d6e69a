#!/usr/bin/env python
"""Prototype: Pallas row scatter-add with a VMEM-resident accumulator.

XLA's scatter-add is row-count bound at ~62M rows/s on v5e regardless of
row width (measured in exp_reassoc.py), which caps the blend backward
(1.9M rows -> 31 ms) and the hexplane backward (1.6M rows -> ~25 ms).
This kernel streams source rows through VMEM and accumulates into a
VMEM-resident table with a serial per-row dynamic add; measure whether
Mosaic sustains a useful rate (> 200M rows/s would be a 3x+ win).

Variants:
  - idx read from VMEM block vs SMEM (DMA'd)
  - row width 128 (hexplane) and 16 (blend grads)
  - unrolled 8-wide row processing
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

from _timing import sync


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt


def make_scatter_add(n_rows_out, width, blk, m, unroll=1):
    """rows (m, width) + idx (m,) -> acc (n_rows_out, width) f32."""
    n_blocks = m // blk

    def kernel(idx_ref, rows_ref, out_ref):
        # out_ref doubles as the accumulator (constant index map keeps the
        # block VMEM-resident across grid steps; a separate scratch would
        # double VMEM and OOM at the 131k x 16 table size)
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(r, _):
            for u in range(unroll):
                i = idx_ref[0, r * unroll + u]
                out_ref[pl.ds(i, 1), :] += rows_ref[pl.ds(r * unroll + u, 1), :]
            return _

        jax.lax.fori_loop(0, blk // unroll, body, 0)

    fn = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda b: (0, b),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, width), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows_out, width), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows_out, width), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    def call(idx, rows):
        return fn(idx[None, :], rows)

    return call


def main():
    rng = np.random.default_rng(0)

    # hexplane-like: 131k rows of 128 lanes into 4096 cells
    m, w, cells = 131072, 128, 4096
    rows = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, cells, m).astype(np.int32))

    def xla_scatter(idx, rows):
        return jnp.zeros((cells, w), jnp.float32).at[idx].add(rows)

    ref = jax.jit(xla_scatter)(idx, rows)
    timeit(f"XLA scatter-add    ({m/1e3:.0f}k x {w} -> {cells})",
           jax.jit(xla_scatter), idx, rows)

    for blk in (1024, 4096):
        for unroll in (1, 4):
            f = jax.jit(make_scatter_add(cells, w, blk, m, unroll))
            out = f(idx, rows)
            err = float(jnp.abs(out - ref).max())
            timeit(f"pallas blk={blk} unroll={unroll} (err={err:.1e})",
                   f, idx, rows)

    # blend-like: 1.9M rows of 16 lanes into 131k gaussians
    m2, w2, n2 = 1_966_080, 16, 131072 + 8
    rows2 = jnp.asarray(rng.standard_normal((m2, w2)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, n2, m2).astype(np.int32))

    def xla_scatter2(idx, rows):
        return jnp.zeros((n2, w2), jnp.float32).at[idx].add(rows)

    ref2 = jax.jit(xla_scatter2)(idx2, rows2)
    timeit(f"XLA scatter-add    ({m2/1e6:.1f}M x {w2} -> {n2/1e3:.0f}k)",
           jax.jit(xla_scatter2), idx2, rows2)

    for blk in (4096,):
        for unroll in (1, 8):
            f = jax.jit(make_scatter_add(n2, w2, blk, m2, unroll))
            out = f(idx2, rows2)
            err = float(jnp.abs(out - ref2).max())
            timeit(f"pallas blk={blk} unroll={unroll} (err={err:.1e})",
                   f, idx2, rows2)


if __name__ == "__main__":
    main()
