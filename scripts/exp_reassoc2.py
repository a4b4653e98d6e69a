#!/usr/bin/env python
"""Micro-bench reassociate_pair_grads variants (layout/scan alternatives).

The reassociation is gather(524k x 16f32) + cumsum((32,16384,16) axis=1)
+ boundary gathers. The (.., 16) trailing dim uses 16 of 128 lanes, so the
cumsum runs at 12.5% lane utilization; variants test a transpose to put the
scanned axis on lanes, associative_scan, and 10-channel narrowing."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

nck, pc, W = 32, 16384, 16
total = nck * pc
nrows = 625 * 1536
n = 131072
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(size=(nrows, W)), jnp.float32)
dest = jnp.asarray(rng.integers(0, nrows + 1000, total), jnp.int32)
slot0 = jnp.asarray(np.sort(rng.integers(0, total, n)), jnp.int32)
# clamp alloc so slot0 + alloc stays inside slot0's chunk budget, matching
# the real binner (gs_alloc clip in rasterize_tiled.py) — keeps the
# boundary gathers in-range so variant outputs are numerically comparable
alloc_raw = rng.integers(0, 6, n)
alloc = jnp.asarray(
    np.minimum(alloc_raw, pc - (np.asarray(slot0) % pc)), jnp.int32)
gid = jnp.asarray(rng.permutation(n), jnp.int32)

def t(fn, name):
    f = jax.jit(fn)
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20): r = f()
    jax.block_until_ready(r)
    print(f"{name:24s} {(time.perf_counter()-t0)/20*1000:.2f} ms")

def boundary(csf, w):
    chunk_of = slot0 // pc
    base = chunk_of * (pc + 1)
    a = base + (slot0 - chunk_of * pc)
    seg = csf[a + alloc] - csf[a]
    idx = jnp.where(gid < n, gid, n + 1)
    return jnp.zeros((n + 1, w), jnp.float32).at[idx].set(seg, mode="drop", unique_indices=True)[:n].sum()

def v_current():
    gs = jnp.take(packed, dest, axis=0, mode="fill", fill_value=0.0)
    cs = jnp.cumsum(gs.reshape(nck, pc, W), axis=1)
    cs = jnp.concatenate([jnp.zeros((nck, 1, W), jnp.float32), cs], axis=1)
    return boundary(cs.reshape(nck * (pc + 1), W), W)

def v_assoc():
    gs = jnp.take(packed, dest, axis=0, mode="fill", fill_value=0.0)
    cs = jax.lax.associative_scan(jnp.add, gs.reshape(nck, pc, W), axis=1)
    cs = jnp.concatenate([jnp.zeros((nck, 1, W), jnp.float32), cs], axis=1)
    return boundary(cs.reshape(nck * (pc + 1), W), W)

def v_T():
    gs = jnp.take(packed, dest, axis=0, mode="fill", fill_value=0.0)
    g3 = jnp.moveaxis(gs.reshape(nck, pc, W), 2, 1)      # (nck, W, pc)
    cs = jnp.cumsum(g3, axis=2)
    cs = jnp.concatenate([jnp.zeros((nck, W, 1), jnp.float32), cs], axis=2)
    csf = jnp.moveaxis(cs, 1, 2).reshape(nck * (pc + 1), W)
    return boundary(csf, W)

def v_10ch():
    gs = jnp.take(packed[:, :10], dest, axis=0, mode="fill", fill_value=0.0)
    cs = jnp.cumsum(gs.reshape(nck, pc, 10), axis=1)
    cs = jnp.concatenate([jnp.zeros((nck, 1, 10), jnp.float32), cs], axis=1)
    return boundary(cs.reshape(nck * (pc + 1), 10), 10)

def v_gather_only():
    gs = jnp.take(packed, dest, axis=0, mode="fill", fill_value=0.0)
    return gs.sum()

t(v_current, "current(cumsum,16)")
t(v_assoc, "assoc_scan")
t(v_T, "transposed_lane_scan")
t(v_10ch, "10ch")
t(v_gather_only, "gather_only")
