#!/usr/bin/env python
"""Round-2 micro-bench: (a) one fused scatter-add for all 6 spatial-plane
backwards vs 6 separate ops; (b) f32-division variant of the binner pair
expansion's local//sx, local%sx (TPU has no native int divide)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

N = 131072
C4 = 128
rng = np.random.default_rng(0)

def t(fn, name, iters=20, args=()):
    # inputs are passed as jit ARGUMENTS (not closed-over constants) so XLA
    # cannot constant-fold them and memory placement matches real kernels
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")

# (a) spatial-plane scatter-adds: level0 3x(4096 rows), level1 3x(16384 rows)
tables = [4096, 4096, 4096, 16384, 16384, 16384]
idxs = [jnp.asarray(rng.integers(0, r, N), jnp.int32) for r in tables]
grads = [jnp.asarray(rng.normal(size=(N, C4)), jnp.float32) for _ in tables]

def v_sep(*ig):
    idxs_, grads_ = ig[:6], ig[6:]
    outs = [jnp.zeros((r, C4), jnp.float32).at[i].add(g)
            for r, i, g in zip(tables, idxs_, grads_)]
    return sum(o.sum() for o in outs)

offs = np.concatenate([[0], np.cumsum(tables)])[:-1]
idx_cat = jnp.concatenate([i + int(o) for i, o in zip(idxs, offs)])
grad_cat = jnp.concatenate(grads)
def v_cat(idx_cat, grad_cat):
    return jnp.zeros((int(sum(tables)), C4), jnp.float32).at[idx_cat].add(grad_cat).sum()

# interleave rows from the 6 sources (same totals, one scatter, maybe
# better pipelining than the pre-concatenated copy)
def v_cat_nocopy(*ig):
    idxs_, grads_ = ig[:6], ig[6:]
    buf = jnp.zeros((int(sum(tables)), C4), jnp.float32)
    for i, g, o in zip(idxs_, grads_, offs):
        buf = buf.at[i + int(o)].add(g)
    return buf.sum()

t(v_sep, "6 separate scatter-adds", args=tuple(idxs) + tuple(grads))
t(v_cat, "1 concat scatter-add", args=(idx_cat, grad_cat))
t(v_cat_nocopy, "6 adds into one buffer", args=tuple(idxs) + tuple(grads))

# (b) expansion int div vs f32 div
TOTAL = 32 * 16384
row4 = jnp.asarray(rng.integers(1, 25, TOTAL), jnp.int32)
loc = jnp.asarray(rng.integers(0, 625, TOTAL), jnp.int32)
def v_intdiv(loc, row4):
    return (loc // row4 + loc % row4).sum()
def v_f32div(loc, row4):
    # PRECONDITION: exact only while the dividend < 2^24 (f32 mantissa);
    # floor(fl(a/b)) can be off by one above that. Safe here (loc < 625)
    # and in the binner (total_slots < 2^24) — assert before porting this
    # trick anywhere slot counts could grow past 16.7M.
    q = jnp.floor(loc.astype(jnp.float32) / row4.astype(jnp.float32)).astype(jnp.int32)
    return (q + (loc - q * row4)).sum()
t(v_intdiv, "int div+mod (TOTAL)", args=(loc, row4))
t(v_f32div, "f32 div+mod (TOTAL)", args=(loc, row4))
