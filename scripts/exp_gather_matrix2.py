#!/usr/bin/env python
"""Round 2 of the gather/scatter matrix: validate the harness against a
known-cost op, then isolate WHY production-shaped gathers/scatters are
1000x slower than clean power-of-two ones (alignment? drop mode? odd row
counts?). (dev tool)"""
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
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1000:9.3f} ms")


def main():
    rng = np.random.default_rng(0)

    # harness sanity: 1 GB elementwise (~2.5 ms at 819 GB/s r+w)
    big = jnp.ones((1 << 27,), jnp.float32)  # 512 MB
    timeit("sanity: 512MB x*1.5+1 (expect ~1.3ms)",
           jax.jit(lambda x: x * 1.5 + 1.0), big)
    del big

    w = 16
    # production shapes: scatter 1.92M rows -> 100001 rows, mode=drop
    nt_cap = 2500 * 768
    n = 100000
    rows = jnp.asarray(rng.normal(size=(nt_cap, w)).astype(np.float32))
    gidx = rng.integers(0, n, nt_cap).astype(np.int32)
    gidx[rng.random(nt_cap) < 0.78] = -1    # 22% live, like the real binner
    flat = jnp.asarray(gidx)

    def s_drop(r, f):
        fi = jnp.where(f >= 0, f, n)
        return jnp.zeros((n + 1, w), jnp.float32).at[fi].add(r, mode="drop")

    timeit("scatter 1.92M->100001 mode=drop (production)", jax.jit(s_drop),
           rows, flat)

    def s_nodrop(r, f):
        fi = jnp.where(f >= 0, f, n)
        return jnp.zeros((n + 1, w), jnp.float32).at[fi].add(r)

    timeit("scatter 1.92M->100001 default mode", jax.jit(s_nodrop),
           rows, flat)

    def s_pow2(r, f):
        fi = jnp.where(f >= 0, f, (1 << 17) - 1)
        return jnp.zeros((1 << 17, w), jnp.float32).at[fi].add(r)

    timeit("scatter 1.92M->131072 (pow2 tgt)", jax.jit(s_pow2), rows, flat)

    def s_pow2_drop(r, f):
        fi = jnp.where(f >= 0, f, 1 << 17)
        return jnp.zeros(((1 << 17) + 1, w), jnp.float32).at[fi].add(
            r, mode="drop")

    timeit("scatter 1.92M->131073 pow2+1 drop", jax.jit(s_pow2_drop),
           rows, flat)

    # 2D index shape like the real code (reshape(-1) of (2500,768))
    rows2d = rows
    def s_2d(r, f):
        fi = jnp.where(f >= 0, f, n).reshape(2500, 768)
        r = r.reshape(2500, 768, w)
        return jnp.zeros((n + 1, w), jnp.float32).at[
            fi.reshape(-1)].add(r.reshape(-1, w), mode="drop")

    timeit("scatter via reshape (same)", jax.jit(s_2d), rows2d, flat)

    # gathers: production tbl[idx] where tbl=(100001,16), idx 1.92M w/ where
    tblp = jnp.asarray(rng.normal(size=(n + 1, w)).astype(np.float32))
    def g_prod(t, f):
        fi = jnp.where(f >= 0, f, n)
        return t[fi]
    timeit("gather 1.92M from 100001-row tbl (pack_attrs)", jax.jit(g_prod),
           tblp, flat)

    tbl2 = jnp.asarray(rng.normal(size=(1 << 17, w)).astype(np.float32))
    def g_pow2(t, f):
        fi = jnp.where(f >= 0, f, 0)
        return t[fi]
    timeit("gather 1.92M from 131072-row tbl", jax.jit(g_pow2), tbl2, flat)

    # gather 819k rows from 1.92M-row table (the segsum pair gather)
    big_tbl = jnp.asarray(rng.normal(size=(nt_cap, w)).astype(np.float32))
    dest = jnp.asarray(rng.integers(0, nt_cap, 819200).astype(np.int32))
    timeit("gather 819200 from 1.92M tbl", jax.jit(lambda t, i: t[i]),
           big_tbl, dest)
    dest_pow2 = jnp.asarray(rng.integers(0, nt_cap, 1 << 20).astype(np.int32))
    timeit("gather 1048576 from 1.92M tbl", jax.jit(lambda t, i: t[i]),
           big_tbl, dest_pow2)

    big_tblp = jnp.pad(big_tbl, ((0, 2**21 - nt_cap), (0, 0)))
    timeit("gather 819200 from 2^21-row tbl", jax.jit(lambda t, i: t[i]),
           big_tblp, dest)

    # int32 narrow gather like tbl[owner] (w=6)
    tbl6 = jnp.asarray(rng.integers(0, 1000, (102400, 6)).astype(np.int32))
    own = jnp.asarray(np.sort(rng.integers(0, 102400, 819200)).astype(np.int32))
    timeit("gather 819200 x w6 int32 (tbl[owner])", jax.jit(lambda t, i: t[i]),
           tbl6, own)
    tbl8 = jnp.pad(tbl6, ((0, 0), (0, 2)))
    timeit("gather 819200 x w8 int32 padded", jax.jit(lambda t, i: t[i]),
           tbl8, own)


if __name__ == "__main__":
    main()
