#!/usr/bin/env python
"""Adam cost: many small leaves vs one flat vector (dev tool)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, optax
from _timing import timeit

rng = np.random.default_rng(0)
cap = 131072
shapes = ([("g%d" % i, (cap, d)) for i, d in enumerate([3,3,45,3,4,1])]
          + [("p%d" % i, (128,128,32)) for i in range(6)]
          + [("q%d" % i, (64,64,32)) for i in range(6)]
          + [("m%d" % i, (64,64)) for i in range(10)])
params = {k: jnp.asarray(rng.normal(size=s), jnp.float32) for k, s in shapes}
total = sum(int(np.prod(s)) for _, s in shapes)
print("leaves:", len(shapes), "total params:", total)

tx = optax.adam(1e-3, eps=1e-15)
st = tx.init(params)
grads = jax.tree.map(jnp.ones_like, params)
fn = jax.jit(lambda g, s, p: tx.update(g, s, p))
timeit("adam tree (30 leaves)", fn, grads, st, params)

flat = jnp.zeros((total,), jnp.float32)
stf = tx.init(flat)
gf = jnp.ones((total,), jnp.float32)
fnf = jax.jit(lambda g, s, p: tx.update(g, s, p))
timeit("adam flat (1 leaf)", fnf, gf, stf, flat)
