#!/usr/bin/env python
"""Micro-bench: 1D scalar gather/scatter vs 128-lane row reformulations.

The binner's hot ops are 1D: rank gather (524k scalars from a 2.56M f32
table), final scatter (524k int32 scalars into a 960k table), marks
scatter (131k into 524k). TPU gathers/scatters move (sublane, 128-lane)
rows; a scalar access wastes the row. Reformulation: view the flat table
as (rows, 128); gather the full row then select the lane with a one-hot
dot (VPU); scatter val*onehot(lane) rows with add-combining.

Run with 30-iteration one-sync timing (axon dispatch floor ~3 ms must be
amortized; see exp_step_ablate docstring).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NQ = 1 << 19       # 524288 accesses
TBL = 4096 * 640   # 2.62M-element table (cc-sized)
OUT = 7520 * 128   # 962k (gidx-sized, 128-aligned)


def bench(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(2):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random(TBL), jnp.float32)
    idx = jnp.asarray(rng.integers(0, TBL, NQ), jnp.int32)
    dest = jnp.asarray(
        rng.permutation(OUT)[:NQ], jnp.int32)   # unique dests
    val = jnp.asarray(rng.integers(0, 1 << 20, NQ), jnp.int32)

    # --- gather variants -------------------------------------------------
    def g_1d(t, i):
        return t[i].sum()

    def g_lane(t, i):
        t2 = t.reshape(-1, 128)
        rows = t2[i // 128]                     # (NQ, 128) row gather
        lane = jax.nn.one_hot(i % 128, 128, dtype=t.dtype)
        return (rows * lane).sum()

    # --- scatter variants ------------------------------------------------
    def s_1d(d, v):
        return jnp.full((OUT,), -1, jnp.int32).at[d].set(
            v, mode="drop", unique_indices=True)

    def s_lane(d, v):
        lane = jax.nn.one_hot(d % 128, 128, dtype=jnp.int32)
        rows = (v + 1)[:, None] * lane          # one nonzero lane per row
        acc = jnp.zeros((OUT // 128, 128), jnp.int32).at[d // 128].add(
            rows, mode="drop")
        return acc - 1                          # untouched = -1

    bench("1D scalar gather (524k of 2.6M)", g_1d, tbl, idx)
    bench("row gather + lane select", g_lane, tbl, idx)
    bench("1D scalar scatter-set (524k into 960k)", s_1d, dest, val)
    bench("row scatter-add one-hot lanes", s_lane, dest, val)

    # correctness spot check
    a = np.asarray(jax.jit(s_1d)(dest, val))
    b = np.asarray(jax.jit(s_lane)(dest, val)).reshape(-1)
    assert (a == b).all(), "lane scatter mismatch"
    ga = float(jax.jit(g_1d)(tbl, idx))
    gb = float(jax.jit(g_lane)(tbl, idx))
    np.testing.assert_allclose(gb, ga, rtol=1e-5)
    print("correctness ok")


if __name__ == "__main__":
    main()
