#!/usr/bin/env python
"""Decompose flat-Adam update cost (dev tool)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, optax
from _timing import timeit

from fourdgs_tpu.train import optim
from fourdgs_tpu.train.config import Config
cap = 131072
rng = np.random.default_rng(0)
from fourdgs_tpu.models.gaussians import GaussianParams
gauss = GaussianParams(
    xyz=jnp.zeros((cap,3)), features_dc=jnp.zeros((cap,1,3)),
    features_rest=jnp.zeros((cap,15,3)), scaling=jnp.zeros((cap,3)),
    rotation=jnp.zeros((cap,4)), opacity=jnp.zeros((cap,1)))
deform = {"grid": {f"l{l}_p{c}": jnp.zeros((64*(l+1),64*(l+1),32)) for l in range(2) for c in range(6)},
          "mlp": {f"w{i}": jnp.zeros((64,64)) for i in range(10)}}
params = {"gauss": gauss, "deform": deform}
cfg = Config()
tx = optim.build_optimizer(cfg.opt, 1.0, params)
st = tx.init(params)
grads = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params)
timeit("flat update_fn (tree in/out)", jax.jit(lambda g, s: tx.update(g, s, None)), grads, st)

entries, treedef, total = optim.flat_layout(params)
leaves = jax.tree.leaves(grads)
timeit("concat only", jax.jit(lambda ls: jnp.concatenate([l.ravel() for l in ls])), leaves)
flat_g = jnp.concatenate([l.ravel() for l in leaves])
def adam_only(g, mu, nu, c):
    mu = 0.9*mu + 0.1*g
    nu = 0.999*nu + 0.001*g*g
    cc = (c+1).astype(jnp.float32)
    return mu/(1-0.9**cc), nu/(1-0.999**cc), c+1
timeit("adam math only (flat)", jax.jit(adam_only), flat_g, st.mu, st.nu, st.count)
def unflat(f):
    return [f[e.offset:e.offset+e.size].reshape(e.shape) for e in entries]
timeit("unflatten only", jax.jit(lambda f: unflat(f)), flat_g)

ALIGN = 1024
aentries = []
off = 0
for e in entries:
    aentries.append((e.offset, e.size, e.shape, off))
    off += (e.size + ALIGN - 1) // ALIGN * ALIGN
atotal = off
def aconcat(ls):
    segs = []
    for l, (eo, esz, esh, ao) in zip(ls, aentries):
        pad = (esz + ALIGN - 1) // ALIGN * ALIGN - esz
        r = l.ravel()
        segs.append(jnp.concatenate([r, jnp.zeros((pad,), r.dtype)]) if pad else r)
    return jnp.concatenate(segs)
timeit("aligned concat", jax.jit(aconcat), leaves)
aflat = aconcat(leaves)
def aunflat(f):
    return [f[ao:ao+esz].reshape(esh) for (eo, esz, esh, ao) in aentries]
timeit("aligned unflatten", jax.jit(aunflat), aflat)
