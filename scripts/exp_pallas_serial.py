#!/usr/bin/env python
"""Micro-bench: Pallas scalar dynamic-index stores/loads to VMEM.

Decides whether a serial-emission binning kernel is viable: the kernel
would emit ~400k (gaussian, tile) pairs one scalar store at a time into a
VMEM-resident gidx table. Measures sustained pairs/s for:
  a) scalar stores at dynamic indices into a VMEM int32 table
  b) scalar counter load/inc + dependent store (the real binner pattern)
Index chunks stream through SMEM via the grid (4096/step).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import sync

N_PAIRS = 1 << 18          # 262144 emissions
CHUNK = 4096
TABLE = 625 * 1536         # gidx-sized table (960k int32 = 3.84MB)
NT = 625


def store_kernel(idx_ref, val_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        out_ref[idx_ref[i], 0] = val_ref[i]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def counter_kernel(idx_ref, val_ref, out_ref, cnt_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    def body(i, _):
        t = idx_ref[i]
        r = cnt_ref[t]
        cnt_ref[t] = r + 1
        out_ref[jnp.minimum(t * 1536 + r, TABLE - 1), 0] = val_ref[i]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, TABLE, N_PAIRS), jnp.int32)
    tid = jnp.asarray(rng.integers(0, NT, N_PAIRS), jnp.int32)
    val = jnp.asarray(rng.integers(0, 1 << 20, N_PAIRS), jnp.int32)
    grid = N_PAIRS // CHUNK
    smem_chunk = pl.BlockSpec((CHUNK,), lambda i: (i,),
                              memory_space=pltpu.SMEM)
    whole = pl.BlockSpec((TABLE, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    store = pl.pallas_call(
        store_kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((TABLE, 1), jnp.int32),
        in_specs=[smem_chunk, smem_chunk],
        out_specs=whole,
    )
    counter = pl.pallas_call(
        counter_kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((TABLE, 1), jnp.int32),
                   jax.ShapeDtypeStruct((NT,), jnp.int32)),
        in_specs=[smem_chunk, smem_chunk],
        out_specs=(whole,
                   pl.BlockSpec((NT,), lambda i: (0,),
                                memory_space=pltpu.SMEM)),
    )

    for name, fn, args in [("store", jax.jit(store), (idx, val)),
                           ("counter", jax.jit(counter), (tid, val))]:
        try:
            out = fn(*args)
            sync(out)
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                out = fn(*args)
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:10s} {dt*1000:8.2f} ms  "
                  f"{N_PAIRS/dt/1e6:8.1f} Mpairs/s", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
