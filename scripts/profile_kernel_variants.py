#!/usr/bin/env python
"""Isolate the slow part of the Pallas blend kernel (dev tool): time
stripped variants on the same data volume as the 100k/800px case."""
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

NT, NCH, K, P, T_BLK = 2504, 24, 32, 256, 8
ATTR = 16


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms",
          flush=True)


def scan_mul(x, k, axis=1):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    d = 1
    while d < k:
        x = x * jnp.where(row >= d, pltpu.roll(x, d, axis), 1.0)
        d *= 2
    return x


def make_call(kernel, n_out_attr=False):
    out_spec = (pl.BlockSpec((T_BLK, K, ATTR), lambda t, j: (t, j, 0),
                             memory_space=pltpu.VMEM) if n_out_attr else
                pl.BlockSpec((T_BLK, 1, P), lambda t, j: (t, 0, 0),
                             memory_space=pltpu.VMEM))
    out_shape = (jax.ShapeDtypeStruct((NT, NCH * K, ATTR), jnp.float32)
                 if n_out_attr else
                 jax.ShapeDtypeStruct((NT, 1, P), jnp.float32))
    def call(attrs, px):
        return pl.pallas_call(
            kernel,
            grid=(NT // T_BLK, NCH),
            in_specs=[
                pl.BlockSpec((T_BLK, K, ATTR), lambda t, j: (t, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T_BLK, 1, P), lambda t, j: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_spec],
            out_shape=[out_shape],
            scratch_shapes=[pltpu.VMEM((T_BLK, 1, P), jnp.float32)],
        )(attrs, px)[0]
    return jax.jit(call)


def k_dma_only(attrs_ref, px_ref, o_ref, acc):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    acc[:] = acc[:] + attrs_ref[:, 0:1, 0:1] * px_ref[:]
    @pl.when(j == NCH - 1)
    def _():
        o_ref[:] = acc[:]


def k_exp_only(attrs_ref, px_ref, o_ref, acc):
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    a = attrs_ref[:]
    x = a[:, :, 0:1] - px_ref[:]
    e = jnp.exp(-0.5 * x * x)
    acc[:] = acc[:] + jnp.sum(e, axis=1, keepdims=True)
    @pl.when(j == NCH - 1)
    def _():
        o_ref[:] = acc[:]


def k_slices(attrs_ref, px_ref, o_ref, acc):
    """10 attr slices broadcast, no exp, no scans."""
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    a = attrs_ref[:]
    px = px_ref[:]
    s = a[:, :, 0:1] - px
    for i in range(1, 10):
        s = s + a[:, :, i:i + 1] * px
    acc[:] = acc[:] + jnp.sum(s, axis=1, keepdims=True)
    @pl.when(j == NCH - 1)
    def _():
        o_ref[:] = acc[:]


def k_scans(attrs_ref, px_ref, o_ref, acc):
    """two Kogge-Stone scans, minimal other work."""
    j = pl.program_id(1)
    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    a = attrs_ref[:]
    x = a[:, :, 0:1] * px_ref[:]
    s1 = scan_mul(1.0 - 0.001 * x, K)
    s2 = scan_mul(1.0 - 0.002 * x, K)
    acc[:] = acc[:] + jnp.sum(s1 + s2, axis=1, keepdims=True)
    @pl.when(j == NCH - 1)
    def _():
        o_ref[:] = acc[:]


def main():
    rng = np.random.default_rng(0)
    attrs = jnp.asarray(rng.uniform(0, 1, (NT, NCH * K, ATTR)), jnp.float32)
    px = jnp.asarray(rng.uniform(0, 1, (NT, 1, P)), jnp.float32)
    print(f"device={jax.devices()[0]} volume={NT*NCH*K*P/1e6:.0f}M elem",
          flush=True)
    timeit("dma only", make_call(k_dma_only), attrs, px)
    timeit("exp (1 slice)", make_call(k_exp_only), attrs, px)
    timeit("10 slices broadcast", make_call(k_slices), attrs, px)
    timeit("2 kogge-stone scans", make_call(k_scans), attrs, px)


if __name__ == "__main__":
    main()
