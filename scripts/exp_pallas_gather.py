#!/usr/bin/env python
"""Can a Pallas TPU kernel gather rows from a VMEM-resident table faster
than XLA's gather? Tests lowering support + speed of several formulations.
(dev tool, round 2)"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=20):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name:52s} FAILED: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    tbl_rows, w = 1 << 17, 16          # 128k x 16 f32 = 8 MB table
    n_idx = 1 << 20
    tbl = jnp.asarray(rng.normal(size=(tbl_rows, w)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, tbl_rows, n_idx).astype(np.int32))

    ref = timeit("XLA gather (baseline)", jax.jit(lambda t, i: t[i]),
                 tbl, idx)

    # --- variant 1: jnp.take inside kernel, whole table in VMEM ---
    BLK = 4096

    def k1(idx_ref, tbl_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    def gather1(tbl, idx):
        return pl.pallas_call(
            k1,
            grid=(n_idx // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tbl_rows, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_idx, w), jnp.float32),
        )(idx, tbl)

    o1 = timeit("pallas jnp.take(table VMEM)", jax.jit(gather1), tbl, idx)
    if o1 is not None and ref is not None:
        print("   match:", bool(jnp.allclose(o1, ref)))

    # --- variant 2: take_along_axis formulation ---
    def k2(idx_ref, tbl_ref, out_ref):
        ii = idx_ref[:][:, None]
        out_ref[:] = jnp.take_along_axis(
            tbl_ref[:], jnp.broadcast_to(ii, (BLK, w)), axis=0)

    def gather2(tbl, idx):
        return pl.pallas_call(
            k2,
            grid=(n_idx // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tbl_rows, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_idx, w), jnp.float32),
        )(idx, tbl)

    o2 = timeit("pallas take_along_axis(table VMEM)", jax.jit(gather2),
                tbl, idx)
    if o2 is not None and ref is not None:
        print("   match:", bool(jnp.allclose(o2, ref)))

    # --- variant 3: fori_loop of dynamic row reads ---
    def k3(idx_ref, tbl_ref, out_ref):
        def body(r, _):
            out_ref[pl.ds(r, 1), :] = tbl_ref[pl.ds(idx_ref[r], 1), :]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0)

    def gather3(tbl, idx):
        return pl.pallas_call(
            k3,
            grid=(n_idx // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tbl_rows, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_idx, w), jnp.float32),
        )(idx, tbl)

    o3 = timeit("pallas fori dynamic-row loop", jax.jit(gather3), tbl, idx)
    if o3 is not None and ref is not None:
        print("   match:", bool(jnp.allclose(o3, ref)))

    # --- variant 4: lax.gather inside kernel ---
    def k4(idx_ref, tbl_ref, out_ref):
        out_ref[:] = tbl_ref[:][idx_ref[:]]

    def gather4(tbl, idx):
        return pl.pallas_call(
            k4,
            grid=(n_idx // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tbl_rows, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_idx, w), jnp.float32),
        )(idx, tbl)

    o4 = timeit("pallas adv-index tbl[idx]", jax.jit(gather4), tbl, idx)
    if o4 is not None and ref is not None:
        print("   match:", bool(jnp.allclose(o4, ref)))


if __name__ == "__main__":
    main()
