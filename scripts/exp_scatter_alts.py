#!/usr/bin/env python
"""Experiments: binner pair-expansion internals + scatter-add alternatives.

Dev tool for round-2 perf work. Measures, at production scale (100k pts,
800px), the cost of each stage of the counting binner's pair expansion and
of candidate replacements for the two XLA scatter-adds that dominate the
step (marks scatter in the binner, row scatter-add in blend bwd).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")
    return out


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig

    n_points = int(os.environ.get("PROF_POINTS", 100_000))
    size = 800
    cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                       tile_cap=768, chunk=32, bin_chunk=4096,
                       bin_pairs_per_chunk=32768)
    pts, cols = _synthetic_scene(n_points)
    rng = np.random.default_rng(0)
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.5, -4.0, (n_points, 3)),
                                 jnp.float32))
    quats = jnp.zeros((n_points, 4)).at[:, 0].set(1.0)
    camera = _look_at_camera()
    proj = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 16))(jnp.asarray(pts), scales, quats)
    jax.block_until_ready(proj)

    n = proj.depth.shape[0]
    g = cfg.bin_chunk
    pc = cfg.bin_pairs_per_chunk
    n_chunks = -(-n // g)
    pad = n_chunks * g - n
    total_slots = n_chunks * pc
    np_ = n_chunks * g
    print(f"n={n} n_chunks={n_chunks} total_slots={total_slots}")

    # --- shared prefix: argsort + sorted rects ---
    def prefix(pr):
        visible = pr.tiles_touched > 0
        order = jnp.argsort(jnp.where(visible, pr.depth, jnp.inf))
        rect_min_s = jnp.pad(pr.rect_min[order], ((0, pad), (0, 0)))
        rect_max_s = jnp.pad(pr.rect_max[order], ((0, pad), (0, 0)))
        touched_s = jnp.pad(pr.tiles_touched[order], (0, pad))
        order_p = jnp.pad(order, (0, pad), constant_values=n)
        off = jnp.cumsum(touched_s, dtype=jnp.int32)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), off[:-1]])
        chunk_pair_start = start[::g]
        gauss_chunk = (jnp.arange(np_, dtype=jnp.int32) // g)
        g_slot0 = gauss_chunk * pc + (start - chunk_pair_start[gauss_chunk])
        slot_in_budget = (start - chunk_pair_start[gauss_chunk]) < pc
        return (order_p, rect_min_s, rect_max_s, touched_s, g_slot0,
                slot_in_budget, gauss_chunk)

    pref = timeit("prefix (argsort+sortedgathers+starts)", jax.jit(prefix),
                  proj)
    (order_p, rect_min_s, rect_max_s, touched_s, g_slot0, slot_in_budget,
     gauss_chunk) = [jax.block_until_ready(x) for x in pref]

    # --- stage A: marks scatter + cumsum (current owner computation) ---
    def owner_scatter(g_slot0, slot_in_budget):
        marks = jnp.zeros((total_slots,), jnp.int32).at[
            jnp.where(slot_in_budget, g_slot0, total_slots)].add(
                1, mode="drop")
        return jnp.clip(jnp.cumsum(marks) - 1, 0, np_ - 1)

    timeit("owner: marks scatter+cumsum (current)", jax.jit(owner_scatter),
           g_slot0, slot_in_budget)

    def marks_only(g_slot0, slot_in_budget):
        return jnp.zeros((total_slots,), jnp.int32).at[
            jnp.where(slot_in_budget, g_slot0, total_slots)].add(
                1, mode="drop")

    timeit("owner: marks scatter alone", jax.jit(marks_only),
           g_slot0, slot_in_budget)

    # --- stage B: searchsorted owner ---
    def owner_ss(g_slot0, slot_in_budget, gauss_chunk):
        keys = jnp.where(slot_in_budget, g_slot0, (gauss_chunk + 1) * pc)
        slots = jnp.arange(total_slots, dtype=jnp.int32)
        return (jnp.searchsorted(keys, slots, side="right")
                .astype(jnp.int32) - 1)

    o1 = timeit("owner: searchsorted", jax.jit(owner_ss), g_slot0,
                slot_in_budget, gauss_chunk)
    o0 = jax.jit(owner_scatter)(g_slot0, slot_in_budget)
    print("  owner match:", bool(jnp.all(o0 == jnp.clip(o1, 0, np_ - 1))))

    # --- stage C: tbl row gather ---
    owner = o0
    def tbl_gather(owner):
        tbl = jnp.stack(
            [g_slot0, order_p, rect_min_s[:, 0], rect_min_s[:, 1],
             jnp.maximum(rect_max_s[:, 0] - rect_min_s[:, 0], 1),
             touched_s], axis=1)
        return tbl[owner]

    timeit("tbl[owner] row gather (1M x 6 int32)", jax.jit(tbl_gather), owner)

    # =================== blend-bwd scatter alternatives =================
    nt = cfg.num_tiles
    cap = cfg.tile_cap
    ATTR_W = 16
    rngj = jax.random.key(1)
    grads = jax.random.normal(rngj, (nt * cap, ATTR_W), jnp.float32)
    # realistic gidx: from the real binner
    from fourdgs_tpu.ops.rasterize_tiled import bin_gaussians_count
    binned = jax.jit(lambda pr: bin_gaussians_count(pr, cfg))(proj)
    gidx = jax.block_until_ready(binned.gidx)
    print("pairs:", int(binned.num_pairs), "dropped:",
          int(binned.dropped_pairs + binned.dropped_tile))

    def scatter_current(grads, gidx):
        flat = gidx.reshape(-1)
        flat_idx = jnp.where(flat >= 0, flat, n)
        return jnp.zeros((n + 1, ATTR_W), jnp.float32).at[flat_idx].add(
            grads, mode="drop")

    timeit("bwd scatter-add (current)", jax.jit(scatter_current), grads, gidx)

    # pair-gather + blocked cumsum + boundary diff
    # build dest_all like the binner does (gaussian-major pair slot -> flat
    # (tile, rank) destination, sentinel nt*cap for dropped)
    def make_dest(pr):
        b = bin_gaussians_count(pr, cfg)
        return b

    # reconstruct dest_all outside for the experiment: use a dense replay
    # instead: for each (tile, rank) with gidx>=0 we know the gaussian; we
    # need slot->dest. Build it by scatter (one-off, not timed here).
    # For timing purposes, synthesize a plausible dest_all: random
    # permutation of written slots + sentinels.
    rng2 = np.random.default_rng(2)
    written = np.flatnonzero(np.asarray(gidx.reshape(-1)) >= 0)
    dest_np = np.full((total_slots,), nt * cap, np.int32)
    pos = rng2.choice(total_slots, size=written.shape[0], replace=False)
    dest_np[pos] = written
    dest_all = jnp.asarray(dest_np)

    starts_np = np.sort(rng2.choice(total_slots, size=np_, replace=False)
                        ).astype(np.int32)
    seg_start = jnp.asarray(starts_np)

    def segsum_cumsum(grads, dest_all, seg_start):
        safe = jnp.minimum(dest_all, nt * cap - 1)
        rows = jnp.where((dest_all < nt * cap)[:, None], grads[safe], 0.0)
        c = jnp.cumsum(rows, axis=0)
        ends = jnp.concatenate([seg_start[1:], jnp.array([total_slots],
                                                         jnp.int32)])
        hi = c[ends - 1]
        lo = jnp.where((seg_start > 0)[:, None], c[seg_start - 1], 0.0)
        return hi - lo

    timeit("segsum: gather+jnp.cumsum+bounds", jax.jit(segsum_cumsum),
           grads, dest_all, seg_start)

    def segsum_matmul(grads, dest_all, seg_start):
        safe = jnp.minimum(dest_all, nt * cap - 1)
        rows = jnp.where((dest_all < nt * cap)[:, None], grads[safe], 0.0)
        blk = 512
        nb = total_slots // blk
        rb = rows.reshape(nb, blk, ATTR_W)
        tril = jnp.tril(jnp.ones((blk, blk), jnp.float32))
        incl = jnp.einsum("ij,bjt->bit", tril, rb,
                          preferred_element_type=jnp.float32)
        bsum = incl[:, blk - 1, :]
        boff = jnp.cumsum(bsum, axis=0) - bsum
        c = (incl + boff[:, None, :]).reshape(total_slots, ATTR_W)
        ends = jnp.concatenate([seg_start[1:], jnp.array([total_slots],
                                                         jnp.int32)])
        hi = c[ends - 1]
        lo = jnp.where((seg_start > 0)[:, None], c[seg_start - 1], 0.0)
        return hi - lo

    timeit("segsum: gather+trilmatmul+bounds", jax.jit(segsum_matmul),
           grads, dest_all, seg_start)

    def gather_only(grads, dest_all):
        safe = jnp.minimum(dest_all, nt * cap - 1)
        return jnp.where((dest_all < nt * cap)[:, None], grads[safe], 0.0)

    timeit("segsum: pair row gather alone (1M x 16)", jax.jit(gather_only),
           grads, dest_all)

    # two-level: only boundary positions need the cumsum -> per-block local
    # cumsum, block sums, then gather
    def segsum_twolevel(grads, dest_all, seg_start):
        safe = jnp.minimum(dest_all, nt * cap - 1)
        rows = jnp.where((dest_all < nt * cap)[:, None], grads[safe], 0.0)
        blk = 128
        nb = total_slots // blk
        rb = rows.reshape(nb, blk, ATTR_W)
        local = jnp.cumsum(rb, axis=1)
        bsum = local[:, blk - 1, :]
        boff = jnp.cumsum(bsum, axis=0) - bsum          # (nb, W) exclusive
        ends = jnp.concatenate([seg_start[1:], jnp.array([total_slots],
                                                         jnp.int32)])
        def c_at(p):
            pm = jnp.maximum(p, 0)
            v = local[pm // blk, pm % blk] + boff[pm // blk]
            return jnp.where((p >= 0)[:, None], v, 0.0)
        return c_at(ends - 1) - c_at(seg_start - 1)

    timeit("segsum: two-level local cumsum", jax.jit(segsum_twolevel),
           grads, dest_all, seg_start)


if __name__ == "__main__":
    main()
