#!/usr/bin/env python
"""Fundamental row-op floors on the current chip (r5 session).

Measures the primitive costs the step is built from, at the shapes the
42.9 ms bench step actually uses, so structural decisions target the real
floor instead of folklore numbers:
  * pack gather: (nt*tile_cap) rows x 16 lanes from a (cap+1, 16) table
  * hexplane fwd gather: 131k rows x 128 lanes from 4k/16k-row tables
  * hexplane bwd scatter-add: 131k rows x 128 into 4k/16k-row tables
  * binner scatter-set: 589k narrow int32 rows
  * unstable argsort 131k f32
  * one-hot matmul reduction (the MXU alternative to the bwd scatter)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import timeit


def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    key = jax.random.key(0)
    n = 131072

    # --- pack gather (blend): 320k rows x 16 from 131k-row table
    table16 = jax.random.normal(key, (n + 1, 16))
    idx320 = jax.random.randint(key, (625 * 512,), 0, n)

    @jax.jit
    def pack_gather(t, i):
        return t[i]
    timeit("pack gather 320k x16 (blend tile32)", pack_gather, table16, idx320)

    idx1280 = jax.random.randint(key, (2500 * 512,), 0, n)
    timeit("pack gather 1.28M x16 (blend tile16)", pack_gather, table16,
           idx1280)

    # --- hexplane fwd gather: n rows x 128 from 4k / 16k tables
    for rows in (4096, 16384):
        tab = jax.random.normal(key, (rows, 128))
        idx = jax.random.randint(key, (n,), 0, rows)
        timeit(f"hex fwd gather {n//1024}k x128 from {rows}", pack_gather,
               tab, idx)

    # --- hexplane bwd scatter-add
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def scat_add(i, g, rows):
        return jnp.zeros((rows, 128), jnp.float32).at[i].add(g)
    for rows in (4096, 16384):
        gg = jax.random.normal(key, (n, 128))
        idx = jax.random.randint(key, (n,), 0, rows)
        timeit(f"hex bwd scatter-add {n//1024}k x128 -> {rows}",
               lambda i, g, r=rows: scat_add(i, g, r), idx, gg)

    # narrower scatter rows: is the floor per-row or per-byte?
    for w in (16, 32):
        gg = jax.random.normal(key, (n, w))
        idx = jax.random.randint(key, (n,), 0, 16384)

        @jax.jit
        def scat_w(i, g):
            return jnp.zeros((16384, w), jnp.float32).at[i].add(g)
        timeit(f"scatter-add {n//1024}k x{w} -> 16384", scat_w, idx, gg)

    # --- one-hot matmul reduction (MXU alternative): bf16 one-hot
    @functools.partial(jax.jit, static_argnums=2)
    def onehot_reduce(i, g, rows):
        oh = jax.nn.one_hot(i, rows, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            oh, g.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    for rows in (4096, 16384):
        gg = jax.random.normal(key, (n, 128))
        idx = jax.random.randint(key, (n,), 0, rows)
        timeit(f"one-hot bf16 matmul reduce {n//1024}k x128 -> {rows}",
               lambda i, g, r=rows: onehot_reduce(i, g, r), idx, gg)

    # --- binner scatter-set 589k narrow
    idx589 = jax.random.permutation(
        key, jnp.arange(640 * 1024, dtype=jnp.int32))[:589824]
    val589 = jnp.arange(589824, dtype=jnp.int32)

    @jax.jit
    def scat_set(i, v):
        return jnp.full((640 * 1024,), -1, jnp.int32).at[i].set(
            v, mode="drop", unique_indices=True)
    timeit("binner scatter-set 589k narrow int32", scat_set, idx589, val589)

    # --- argsort
    depth = jax.random.uniform(key, (n,))

    @jax.jit
    def asort(d):
        return jnp.argsort(d, stable=False)
    timeit("argsort 131k f32 unstable", asort, depth)

    # --- 589k-slot row gather from 131k x 6-col table (binner expand)
    tbl6 = jax.random.normal(key, (n, 6))
    own = jax.random.randint(key, (589824,), 0, n)
    timeit("binner expand gather 589k x6", pack_gather, tbl6, own)

    # --- big elementwise baseline for scale: 246M fma
    a = jax.random.normal(key, (960, 256, 1024))

    @jax.jit
    def fma(x):
        return x * 1.0001 + 0.5
    timeit("elementwise fma 252M f32", fma, a)


if __name__ == "__main__":
    main()


def merged_hex():
    """Merged-table candidates: ONE gather/scatter for all 6 spatial
    plane samples (2 levels x 3 planes, widths all 128)."""
    import functools
    import jax
    import jax.numpy as jnp
    from scripts._timing import timeit
    key = jax.random.key(1)
    n = 131072
    rows_tot = 3 * 4096 + 3 * 16384
    tab = jax.random.normal(key, (rows_tot, 128))
    idx = jax.random.randint(key, (6 * n,), 0, rows_tot)
    g = jax.random.normal(key, (6 * n, 128))

    @jax.jit
    def gat(t, i):
        return t[i]
    timeit("merged hex fwd gather 786k x128", gat, tab, idx)

    @jax.jit
    def scat(i, gg):
        return jnp.zeros((rows_tot, 128), jnp.float32).at[i].add(gg)
    timeit("merged hex bwd scatter-add 786k x128", scat, idx, g)

    gb = g.astype(jnp.bfloat16)

    @jax.jit
    def scat_bf(i, gg):
        return jnp.zeros((rows_tot, 128), jnp.bfloat16).at[i].add(gg)
    timeit("merged hex bwd scatter-add 786k x128 bf16", scat_bf, idx, gb)


if __name__ == "__main__" and os.environ.get("MERGED"):
    merged_hex()
