#!/usr/bin/env python
"""Micro-bench: (tile,rank)->gaussian-slot grad reassociation primitives.

The blend backward must fold ~1-2M per-pair grad rows (written in tile-major
(tile, rank) order by the kernel) into per-gaussian rows. Candidates:
  A. scatter-ADD straight into (N, 16)            [current, ~32 ms]
  B. unique scatter-SET into dense (N*16slots, W) then reshape-sum
  C. gather by dest into dense slots then reshape-sum
  D. width scaling of A (is scatter row-bound or byte-bound?)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import sync


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms",
          flush=True)


def main():
    n = 131072          # gaussians
    nt, cap = 2500, 768
    m = nt * cap        # pair rows in tile-major layout
    k1 = 16             # dense slots per gaussian
    rng = np.random.default_rng(0)

    # realistic-ish: ~650k live pairs
    live = rng.random(m) < 0.34
    gidx_np = np.where(live, rng.integers(0, n, m), -1).astype(np.int32)
    gidx = jnp.asarray(gidx_np)

    # dest: for each live (tile,rank) row, a unique slot in (n, k1)
    # (synthesize: per gaussian sequential slot ids, capped at k1)
    order = np.argsort(gidx_np, kind="stable")
    dest_np = np.full(m, n * k1, np.int64)
    sorted_g = gidx_np[order]
    slot_in_g = np.zeros(m, np.int64)
    uniq, starts = np.unique(sorted_g, return_index=True)
    run = np.arange(m) - np.repeat(starts, np.diff(np.append(starts, m)))
    ok = (sorted_g >= 0) & (run < k1)
    dest_np[order[ok]] = sorted_g[ok] * k1 + run[ok]
    dest = jnp.asarray(dest_np.astype(np.int32))

    for w in (4, 16, 32, 128):
        grads = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)
        idx = jnp.where(gidx >= 0, gidx, n)

        def scat_add(g2):
            return jnp.zeros((n + 1, w), jnp.float32).at[idx].add(
                g2, mode="drop")

        timeit(f"A scatter-ADD   (m={m/1e6:.1f}M, w={w})",
               jax.jit(scat_add), grads)

    w = 16
    grads = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)

    def set_then_sum(g2):
        dense = jnp.zeros((n * k1 + 1, w), jnp.float32).at[dest].set(
            g2, mode="drop", unique_indices=True)
        return dense[:-1].reshape(n, k1, w).sum(axis=1)

    timeit("B unique scatter-SET -> dense reshape-sum",
           jax.jit(set_then_sum), grads)

    # C: gather grads rows by per-slot source index, then reshape-sum.
    src_np = np.full(n * k1, m, np.int64)
    valid = dest_np < n * k1
    src_np[dest_np[valid]] = np.flatnonzero(valid)
    src = jnp.asarray(src_np.astype(np.int32))

    def gather_then_sum(g2):
        g2p = jnp.concatenate([g2, jnp.zeros((1, w), jnp.float32)], axis=0)
        dense = g2p[src]
        return dense.reshape(n, k1, w).sum(axis=1)

    timeit("C gather-by-src -> dense reshape-sum",
           jax.jit(gather_then_sum), grads)

    # D: bf16 variants of the winner shapes
    gb = grads.astype(jnp.bfloat16)

    def set_then_sum_bf16(g2):
        dense = jnp.zeros((n * k1 + 1, w), jnp.bfloat16).at[dest].set(
            g2, mode="drop", unique_indices=True)
        return dense[:-1].reshape(n, k1, w).astype(jnp.float32).sum(axis=1)

    timeit("B' bf16 scatter-SET -> dense sum", jax.jit(set_then_sum_bf16), gb)

    def scat_add16(g2):
        idx = jnp.where(gidx >= 0, gidx, n)
        return jnp.zeros((n + 1, w), jnp.bfloat16).at[idx].add(
            g2, mode="drop")

    timeit("A' bf16 scatter-ADD", jax.jit(scat_add16), gb)


if __name__ == "__main__":
    main()
