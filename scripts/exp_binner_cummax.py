#!/usr/bin/env python
"""Binner owner machinery: row-gather vs int64 cummax fill-forward (dev)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from _timing import timeit

S = 1 << 19          # 512k slots
n = 131072
rng = np.random.default_rng(0)
marks_at = jnp.asarray(np.sort(rng.choice(S, n, replace=False)).astype(np.int32))
tbl = jnp.asarray(rng.integers(0, 1 << 11, (n, 6)), jnp.int32)

def owner_gather(marks_at, tbl):
    marks = jnp.zeros((S,), jnp.int32).at[marks_at].add(1)
    owner = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    return tbl[owner]
timeit("owner cumsum + row gather", jax.jit(owner_gather), marks_at, tbl)

def pack_cummax(marks_at, tbl):
    # pack slot0(19b) | f0(11b) | f1(11b) | f2(11b) | f3(11b) into int64
    v = (marks_at.astype(jnp.int64) << 44
         | tbl[:, 0].astype(jnp.int64) << 33
         | tbl[:, 1].astype(jnp.int64) << 22
         | tbl[:, 2].astype(jnp.int64) << 11
         | tbl[:, 3].astype(jnp.int64))
    packed = jnp.zeros((S,), jnp.int64).at[marks_at].max(v)
    run = jax.lax.cummax(packed)
    f0 = (run >> 33) & 0x7FF
    f1 = (run >> 22) & 0x7FF
    f2 = (run >> 11) & 0x7FF
    f3 = run & 0x7FF
    return f0 + f1 + f2 + f3
with jax.enable_x64(True):
    timeit("int64 pack + cummax fill-forward", jax.jit(pack_cummax), marks_at, tbl)

def pack2_cummax(marks_at, tbl):
    # two int32 cummaxes, each [slot0-rank? no: 19b key | 12b payload]
    k = marks_at.astype(jnp.int32) << 12
    a = jnp.zeros((S,), jnp.int32).at[marks_at].max(k | tbl[:, 0])
    b = jnp.zeros((S,), jnp.int32).at[marks_at].max(k | tbl[:, 1])
    ra = jax.lax.cummax(a) & 0xFFF
    rb = jax.lax.cummax(b) & 0xFFF
    return ra + rb
timeit("2x int32 cummax (partial payload)", jax.jit(pack2_cummax), marks_at, tbl)
