#!/usr/bin/env python
"""Round-4: pair-expansion internals. Is the marks scatter running at the
duplicate-rate (~16 ns/row)? A unique-destination variant gives every
gaussian a DISTINCT slot (visible: strictly-increasing g_slot0; invisible
/ over-budget: distinct sacrificial slots past the table) so XLA can use
the parallel unique-indices lowering. Also: tbl[owner] gather alone."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit


def main():
    total_slots = 32 * 16384
    np_ = 131072
    rng = np.random.default_rng(0)
    touched = rng.integers(0, 7, np_).astype(np.int32)
    touched[rng.uniform(size=np_) < 0.2] = 0
    off = np.cumsum(touched)
    start = np.concatenate([[0], off[:-1]]).astype(np.int32)
    g = 4096
    pc = 16384
    chunk_start = start[::g]
    gauss_chunk = np.arange(np_) // g
    s_in = start - chunk_start[gauss_chunk]
    g_slot0 = (gauss_chunk * pc + s_in).astype(np.int32)
    in_budget = s_in < pc

    slot0 = jnp.asarray(g_slot0)
    vis = jnp.asarray((touched > 0) & in_budget)

    def marks_dup(slot0, vis):
        return jnp.zeros((total_slots,), jnp.int32).at[
            jnp.where(vis, slot0, total_slots)].add(1, mode="drop")

    def marks_unique(slot0, vis):
        # distinct sacrificial dests for invisible gaussians
        sac = total_slots + jnp.arange(np_, dtype=jnp.int32)
        dest = jnp.where(vis, slot0, sac)
        return jnp.zeros((total_slots + np_,), jnp.int32).at[dest].add(
            1, mode="drop", unique_indices=True)[:total_slots]

    a = jax.jit(marks_dup)(slot0, vis)
    b = jax.jit(marks_unique)(slot0, vis)
    print("equal:", bool(jnp.array_equal(a, b)))
    timeit("marks scatter (dup lowering)", jax.jit(marks_dup), slot0, vis)
    timeit("marks scatter (unique)", jax.jit(marks_unique), slot0, vis)

    tbl = jnp.asarray(rng.integers(0, 1000, (np_, 7)), jnp.int32)
    owner = jnp.asarray(
        np.minimum.accumulate(
            np.maximum.accumulate(rng.integers(0, np_, total_slots)))
        .astype(np.int32))
    owner = jnp.sort(owner)
    timeit("tbl[owner] gather (524k x 7i32)",
           jax.jit(lambda t, o: t[o]), tbl, owner)

    def expand_math(row):
        slots_g = jnp.arange(total_slots, dtype=jnp.int32)
        local = slots_g - row[:, 0]
        valid = (local >= 0) & (local < row[:, 5])
        sx = jnp.maximum(row[:, 4], 1)
        t_ids = ((row[:, 3] + local // sx) * 25 + row[:, 2] + local % sx)
        return jnp.where(valid, t_ids, 0), valid

    row = tbl[owner]
    timeit("per-slot index math", jax.jit(expand_math), row)

    def cumsum_marks(m):
        return jnp.cumsum(m) - 1

    timeit("cumsum over slots", jax.jit(cumsum_marks), a)


if __name__ == "__main__":
    main()
