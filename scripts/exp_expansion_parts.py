#!/usr/bin/env python
"""Micro-profile the counting binner's hoisted pair expansion, op by op.

The expansion was ~38 ms of the 47 ms binner at the bench point; this
isolates which of (marks scatter, owner cumsum, tbl gather, elementwise,
rank gather, final scatter) actually costs what, to target restructuring.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import sync

N = 131072          # padded gaussian count (bench point)
G = 4096            # bin_chunk
PC = 32768          # bin_pairs_per_chunk
NCH = N // G        # 32 chunks
TOTAL = NCH * PC    # 1.05M slots
NT = 625
CAP = 1536


def bench(name, fn, *args, iters=10):
    fn = jax.jit(fn)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    touched = jnp.asarray(rng.integers(1, 6, N), jnp.int32)
    g_slot0 = jnp.asarray(np.sort(rng.integers(0, TOTAL, N)), jnp.int32)
    owner = jnp.asarray(np.minimum(np.arange(TOTAL) // (TOTAL // N), N - 1),
                        jnp.int32)
    tbl = jnp.asarray(rng.integers(0, 1000, (N, 6)), jnp.int32)
    dest = jnp.asarray(rng.integers(0, NT * CAP, TOTAL), jnp.int32)
    val = jnp.asarray(rng.integers(0, N, TOTAL), jnp.int32)

    bench("marks scatter (N rows)",
          lambda s: jnp.zeros((TOTAL,), jnp.int32).at[s].add(1, mode="drop"),
          g_slot0)
    bench("owner cumsum (TOTAL)",
          lambda m: jnp.cumsum(m), jnp.zeros((TOTAL,), jnp.int32))
    bench("tbl[owner] gather (TOTAL x 6)",
          lambda t, o: t[o], tbl, owner)
    bench("tbl[owner] gather via take",
          lambda t, o: jnp.take(t, o, axis=0), tbl, owner)
    bench("one-col gather (TOTAL)",
          lambda t, o: t[o], tbl[:, 0], owner)

    def elementwise(row):
        slots_g = jnp.arange(TOTAL, dtype=jnp.int32)
        local = slots_g - row[:, 0]
        valid = (local >= 0) & (local < row[:, 5])
        sx = row[:, 4]
        t_ids = (row[:, 3] + local // sx) * 25 + row[:, 2] + local % sx
        return jnp.where(valid, t_ids, 0), jnp.where(valid, row[:, 1], N)

    bench("expansion elementwise (TOTAL)", elementwise, tbl[owner])
    bench("final scatter (TOTAL rows, unique)",
          lambda d, v: jnp.full((NT * CAP,), -1, jnp.int32).at[d].set(
              v, mode="drop", unique_indices=True), dest, val)
    # rank gather inside the scan: per chunk gather of PC from (G*NT)
    cc = jnp.asarray(rng.random((G * NT,)), jnp.float32)
    ridx = jnp.asarray(rng.integers(0, G * NT, PC), jnp.int32)
    bench("rank gather (PC from G*NT) x1", lambda c, r: c[r], cc, ridx)


if __name__ == "__main__":
    main()
