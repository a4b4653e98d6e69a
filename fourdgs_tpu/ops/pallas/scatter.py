"""Serial row scatter-add kernel (Mosaic).

XLA's scatter-add is row-count bound at ~60-110M rows/s on v5e; a serial
Pallas loop doing read-modify-write of (1, W) rows against a VMEM-resident
accumulator sustains ~190M rows/s at W=16 (scripts/exp_pallas_scatter.py).
Used for the blend backward's per-slot -> per-gaussian gradient reduction
when the output table fits VMEM; falls back to the reassociated
prefix-sum reduction otherwise (ops/rasterize_tiled.reassociate_pair_grads).

Out-of-range indices (>= n_out) are dropped via a clamp to a sacrificial
last row, mirroring jnp `.at[].add(mode="drop")` semantics for the padded
slots (callers map them to n_out - 1 and zero their rows, or simply let
the sacrificial row absorb them).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("n_out", "blk", "unroll"))
def scatter_add_rows(idx: jnp.ndarray, rows: jnp.ndarray, *, n_out: int,
                     blk: int = 4096, unroll: int = 8) -> jnp.ndarray:
    """sum rows[i] into out[idx[i]] for i in range(M). idx (M,) int32
    (values clamped to [0, n_out)), rows (M, W) f32 -> (n_out, W) f32."""
    m, w = rows.shape
    pad = (-m) % (blk * unroll)
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, (0, pad), constant_values=n_out - 1)
        # padded rows are zeros -> harmless adds to the sacrificial row
    idx = jnp.clip(idx, 0, n_out - 1)
    mp = rows.shape[0]
    n_blocks = mp // blk

    def kernel(idx_ref, rows_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(r, _):
            base = r * unroll
            for u in range(unroll):
                i = idx_ref[0, 0, base + u]
                out_ref[pl.ds(i, 1), :] += rows_ref[pl.ds(base + u, 1), :]
            return 0

        jax.lax.fori_loop(0, blk // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, blk), lambda b: (0, 0, b),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, w), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, w), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, w), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idx.reshape(1, 1, mp), rows)


@functools.partial(jax.jit, static_argnames=("n_out", "blk", "unroll"))
def scatter_set_scalars(idx: jnp.ndarray, val: jnp.ndarray, *, n_out: int,
                        blk: int = 8192, unroll: int = 8) -> jnp.ndarray:
    """out[idx[i]] = val[i] (unique idx; unwritten slots -1) -> (n_out,)
    int32. Lane-packed accumulator: a (n_out,) int32 scatter target is
    lane-hostile (a 1-wide VMEM row pads to 128 lanes, 8x memory; a 1-D
    array puts the dynamic index on the LANE axis), so pack 128 slots per
    128-lane row and select the slot with an iota mask at write time —
    the same trick as the fused blend-backward accumulator
    (ops/pallas/blend.py). Writes are adds of val+1 into a zero table
    (unique indices make set == add), decoded with a -1 shift so empty
    slots read -1. Out-of-range idx (>= n_out) must be pre-clamped by the
    caller to n_out (the sacrificial tail row absorbs them)."""
    m = idx.shape[0]
    pad = (-m) % (blk * unroll)
    if pad:
        idx = jnp.pad(idx, (0, pad), constant_values=n_out)
        val = jnp.pad(val, (0, pad), constant_values=-1)
    mp = idx.shape[0]
    n_rows = (n_out + 128) // 128 + 1   # + sacrificial tail coverage
    idx = jnp.minimum(idx, n_out)

    def kernel(idx_ref, val_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(r, _):
            base = r * unroll
            for u in range(unroll):
                i = idx_ref[0, 0, base + u]
                v = val_ref[0, 0, base + u]
                out_ref[pl.ds(i // 128, 1), :] += jnp.where(
                    lane == i % 128, v + 1, 0)
            return 0

        jax.lax.fori_loop(0, blk // unroll, body, 0)

    packed = pl.pallas_call(
        kernel,
        grid=(mp // blk,),
        in_specs=[
            pl.BlockSpec((1, 1, blk), lambda b: (0, 0, b),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, blk), lambda b: (0, 0, b),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(idx.reshape(1, 1, mp), val.reshape(1, 1, mp))
    return packed.reshape(-1)[:n_out] - 1


def fits_vmem(n_out: int, w: int, budget_bytes: int = 12 << 20) -> bool:
    """Whether the (n_out, w) f32 accumulator leaves VMEM headroom for the
    streamed row blocks."""
    return n_out * w * 4 <= budget_bytes
