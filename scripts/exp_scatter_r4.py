#!/usr/bin/env python
"""Round-4 micro-bench: alternatives for the hexplane spatial-plane
backward (scatter-add of N=131k 128-wide f32 rows into a (h*w, 128)
packed-corner table; 6 of these are ~10 ms of the train step).

Variants:
  a. XLA scatter-add, random duplicate indices (the current backward)
  b. XLA scatter-add, SORTED duplicate indices (does locality help?)
  c. XLA scatter-add 1-wide (is cost per-row or per-byte?)
  d. sorted segment-sum: cumsum + boundary-diff + masked scatter-add
     (indices pre-sorted, so runs are contiguous; scatter rows still N
     but invalid rows OOB-dropped — does XLA skip them?)
  e. one-hot bf16 matmul oh^T @ g (materializes (N, w) mask)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit


def main():
    n = 131072
    c = 128
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)

    for w in (4096, 16384):
        # cluster structure like a real scene: points on a surface =>
        # ~w/4 occupied cells
        idx_np = rng.integers(0, w, n).astype(np.int32)
        idx = jnp.asarray(idx_np)
        idx_sorted = jnp.asarray(np.sort(idx_np))

        timeit(f"a. scatter-add rand ({n})->({w},{c})",
               jax.jit(lambda gg, ii, w=w: jnp.zeros((w, c)).at[ii].add(gg)),
               g, idx)
        timeit(f"b. scatter-add sorted ({n})->({w},{c})",
               jax.jit(lambda gg, ii, w=w: jnp.zeros((w, c)).at[ii].add(gg)),
               g, idx_sorted)
        timeit(f"c. scatter-add 1-wide ({n})->({w},)",
               jax.jit(lambda gg, ii, w=w: jnp.zeros((w,)).at[ii].add(gg)),
               g[:, 0], idx)

        def segsum(gg, ii, w=w):
            cs = jnp.cumsum(gg, axis=0)
            cs = jnp.concatenate([jnp.zeros((1, c)), cs], axis=0)
            is_end = jnp.concatenate([ii[1:] != ii[:-1],
                                      jnp.ones((1,), bool)])
            # row i is a run END: sum = cs[i+1] - cs[start]; start found by
            # scanning is_start positions via a max-scan of masked iota
            is_start = jnp.concatenate([jnp.ones((1,), bool),
                                        ii[1:] != ii[:-1]])
            start_of = jax.lax.associative_scan(
                jnp.maximum, jnp.where(is_start, jnp.arange(n), -1))
            seg = cs[jnp.arange(n) + 1] - cs[start_of]
            tgt = jnp.where(is_end, ii, w)
            return jnp.zeros((w, c)).at[tgt].add(
                jnp.where(is_end[:, None], seg, 0.0), mode="drop")

        timeit(f"d. sorted segsum+scatter ({n})->({w},{c})",
               jax.jit(segsum), g, idx_sorted)

        def onehot(gg, ii, w=w):
            oh = (ii[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :])
            return jax.lax.dot(oh.astype(jnp.bfloat16).T,
                               gg.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        if w <= 4096:
            timeit(f"e. onehot^T bf16 matmul ({n})x({w},{c})",
                   jax.jit(onehot), g, idx)

        from fourdgs_tpu.ops.pallas.scatter import scatter_add_rows
        for blk in (2048, 4096, 8192):
            timeit(f"f. pallas scatter_add_rows blk{blk} ({n})->({w},{c})",
                   jax.jit(lambda gg, ii, w=w, blk=blk: scatter_add_rows(
                       ii, gg, n_out=w, blk=blk)), g, idx)


if __name__ == "__main__":
    main()
