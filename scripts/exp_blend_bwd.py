#!/usr/bin/env python
"""Blend bwd decomposition: kernel vs grad scatter (dev tool)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from _timing import timeit

n = 131072
nt, cap, w = 625, 1536, 16
rng = np.random.default_rng(0)
g2 = jnp.asarray(rng.normal(size=(nt*cap, w)), jnp.float32)
# realistic gidx: ~60% valid slots
gidx = rng.integers(0, n, (nt, cap)).astype(np.int32)
gidx[:, 900:] = -1
gidx = jnp.asarray(gidx)
def scat(g2, gidx):
    flat = gidx.reshape(-1)
    fi = jnp.where(flat >= 0, flat, n)
    return jnp.zeros((n+1, w), jnp.float32).at[fi].add(g2, mode="drop")
timeit("grad scatter-add (960k rows, 16w)", jax.jit(scat), g2, gidx)

# variant: segment-sum after masking invalid to row n
def scat2(g2, gidx):
    flat = gidx.reshape(-1)
    fi = jnp.where(flat >= 0, flat, n)
    return jax.ops.segment_sum(g2, fi, num_segments=n+1)
timeit("segment_sum (960k rows, 16w)", jax.jit(scat2), g2, gidx)

# --- reassociated: gather to slot space + per-chunk cumsum + boundary diffs ---
n_chunks, pc = 16, 32768
S = n_chunks * pc
dest = jnp.asarray(rng.permutation(nt*cap)[:S].astype(np.int32))  # slot -> table row
a = jnp.sort(jnp.asarray(rng.integers(0, pc-200, (n_chunks, n//n_chunks)), jnp.int32), axis=1)
alloc = jnp.asarray(rng.integers(1, 30, (n_chunks, n//n_chunks)), jnp.int32)
gid = jnp.asarray(rng.permutation(n).astype(np.int32).reshape(n_chunks, -1))
def reassoc(g2, dest, a, alloc, gid):
    gs = jnp.take(g2, dest, axis=0, mode="fill", fill_value=0.0)
    gs = gs.reshape(n_chunks, pc, w)
    cs = jnp.concatenate([jnp.zeros((n_chunks, 1, w)), jnp.cumsum(gs, axis=1)], axis=1)
    csf = cs.reshape(n_chunks*(pc+1), w)
    b = jnp.minimum(a + alloc, pc)
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * (pc+1))[:, None]
    hi = csf[(base + b).reshape(-1)]
    lo = csf[(base + a).reshape(-1)]
    seg = hi - lo
    return jnp.zeros((n+1, w), jnp.float32).at[gid.reshape(-1)].set(
        seg, mode="drop", unique_indices=True)
timeit("reassoc bwd (gather+cumsum+diff+uscatter)", jax.jit(reassoc), g2, dest, a, alloc, gid)
