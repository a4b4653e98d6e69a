#!/usr/bin/env python
"""Hexplane sampling alternatives: gather-vs-onehot-matmul (dev tool).

Questions:
  1. is a row gather from a SMALL table (256 rows) faster than from a big
     one (16k rows)?  (XLA may lower small-table gathers differently)
  2. one-hot bf16 matmul sample: onehot(N,W) @ table(W,2C) fwd, and
     onehot^T @ grads for the bwd (no scatter) — how fast vs gather+scatter?
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit


def main():
    n = 131072
    c2 = 64          # packed row width (2C at C=32)
    rng = np.random.default_rng(0)

    for w in (128, 256, 4096, 16384):
        tab = jnp.asarray(rng.normal(size=(w, c2)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, w, n), jnp.int32)
        fn = jax.jit(lambda t, i: t[i])
        timeit(f"row gather (N={n}) from ({w},{c2})", fn, tab, idx)
        sc = jax.jit(lambda g, i, w=w: jnp.zeros((w, c2), jnp.float32)
                     .at[i].add(g))
        g = jnp.asarray(rng.normal(size=(n, c2)), jnp.float32)
        timeit(f"row scatter-add (N={n}) to ({w},{c2})", sc, g, idx)

    for w in (128, 256):
        tab = jnp.asarray(rng.normal(size=(w, c2)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, w, n), jnp.int32)

        def onehot_fwd(t, i, w=w):
            oh = (i[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :])
            return jax.lax.dot(oh.astype(jnp.bfloat16),
                               t.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        timeit(f"onehot bf16 matmul (N={n}) x ({w},{c2})",
               jax.jit(onehot_fwd), tab, idx)

        def onehot_bwd(g, i, w=w):
            oh = (i[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :])
            return jax.lax.dot(oh.astype(jnp.bfloat16).T,
                               g.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        g = jnp.asarray(rng.normal(size=(n, c2)), jnp.float32)
        timeit(f"onehot^T bf16 matmul bwd (N={n}) x ({w},{c2})",
               jax.jit(onehot_bwd), g, idx)

        # f32 variant (exact)
        def onehot_f32(t, i, w=w):
            oh = (i[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :])
            return jax.lax.dot(oh.astype(jnp.float32), t,
                               preferred_element_type=jnp.float32)

        timeit(f"onehot f32 matmul (N={n}) x ({w},{c2})",
               jax.jit(onehot_f32), tab, idx)


if __name__ == "__main__":
    main()
