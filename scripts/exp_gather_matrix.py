#!/usr/bin/env python
"""Microbenchmark matrix: TPU gather/scatter cost vs table size, index
order, uniqueness, and width. Informs the rasterizer's sparse-transpose
design (dev tool, round 2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")


def main():
    rng = np.random.default_rng(0)
    n_idx = 1 << 20          # 1M gathered/scattered rows
    w = 16

    print(f"== gather {n_idx} rows x {w} f32, random idx, vs table rows ==")
    for tbl_rows in [1 << 15, 1 << 17, 1 << 18, 1 << 19, 1 << 21]:
        tbl = jnp.asarray(rng.normal(size=(tbl_rows, w)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, tbl_rows, n_idx).astype(np.int32))
        timeit(f"gather tbl={tbl_rows:>8} ({tbl_rows*w*4/2**20:.0f} MB)",
               jax.jit(lambda t, i: t[i]), tbl, idx)

    print("== gather 1M rows from 2M-row table: sorted vs random idx ==")
    tbl = jnp.asarray(rng.normal(size=(1 << 21, w)).astype(np.float32))
    idx_r = jnp.asarray(rng.integers(0, 1 << 21, n_idx).astype(np.int32))
    idx_s = jnp.sort(idx_r)
    timeit("gather random idx", jax.jit(lambda t, i: t[i]), tbl, idx_r)
    timeit("gather sorted idx", jax.jit(lambda t, i: t[i]), tbl, idx_s)

    print("== scatter 1M rows x 16 f32 into 128k-row table ==")
    rows = jnp.asarray(rng.normal(size=(n_idx, w)).astype(np.float32))
    tgt_n = 1 << 17
    idx_dup = jnp.asarray(rng.integers(0, tgt_n, n_idx).astype(np.int32))
    idx_dup_s = jnp.sort(idx_dup)
    timeit("scatter-add random idx (dup)",
           jax.jit(lambda r, i: jnp.zeros((tgt_n, w), jnp.float32)
                   .at[i].add(r)), rows, idx_dup)
    timeit("scatter-add sorted idx (dup)",
           jax.jit(lambda r, i: jnp.zeros((tgt_n, w), jnp.float32)
                   .at[i].add(r)), rows, idx_dup_s)

    print("== unique scatter .set of 1M rows into 2M-row table ==")
    big_n = 1 << 21
    idx_u = jnp.asarray(
        rng.choice(big_n, size=n_idx, replace=False).astype(np.int32))
    timeit("unique scatter .set random",
           jax.jit(lambda r, i: jnp.zeros((big_n, w), jnp.float32)
                   .at[i].set(r, unique_indices=True)), rows, idx_u)
    timeit("unique scatter .set sorted",
           jax.jit(lambda r, i: jnp.zeros((big_n, w), jnp.float32)
                   .at[i].set(r, unique_indices=True)), rows,
           jnp.sort(idx_u))

    print("== sort 1M (key int32, 16-f32 payload) ==")
    keys = jnp.asarray(rng.integers(0, 1 << 21, n_idx).astype(np.int32))
    def sort_payload(k, r):
        return jax.lax.sort((k,) + tuple(r[:, i] for i in range(w)),
                            num_keys=1)[1]
    timeit("lax.sort key + 16 payload cols", jax.jit(sort_payload),
           keys, rows)
    def sort_idx_then_gather(k, r):
        perm = jnp.argsort(k)
        return r[perm]
    timeit("argsort + row gather", jax.jit(sort_idx_then_gather), keys, rows)

    print("== widths (1M random gathers from 128k table) ==")
    for ww in [4, 8, 16, 32]:
        tblw = jnp.asarray(rng.normal(size=(1 << 17, ww)).astype(np.float32))
        idxw = jnp.asarray(rng.integers(0, 1 << 17, n_idx).astype(np.int32))
        timeit(f"gather width={ww}", jax.jit(lambda t, i: t[i]), tblw, idxw)

    print("== scatter-add vs n rows (into 128k table, w=16) ==")
    for nn in [1 << 18, 1 << 19, 1 << 20, 1 << 21]:
        rr = jnp.asarray(rng.normal(size=(nn, w)).astype(np.float32))
        ii = jnp.asarray(rng.integers(0, tgt_n, nn).astype(np.int32))
        timeit(f"scatter-add n={nn:>8}",
               jax.jit(lambda r, i: jnp.zeros((tgt_n, w), jnp.float32)
                       .at[i].add(r)), rr, ii)


if __name__ == "__main__":
    main()
