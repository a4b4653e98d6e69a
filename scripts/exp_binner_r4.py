#!/usr/bin/env python
"""Round-4 binner decomposition at the bench config (tile32, cap512,
bc4096, pc16384) + candidate scan variants.

Stages: depth argsort | pair expansion (marks+cumsum+tbl gather) | rank
scan (onehot) | rank scan (onehot2: bf16 incl + matvec base pick) | final
scatter | full binner.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit


def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, bin_gaussians
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config

    n_points = 100_000
    size = 800
    cap = 131072
    cfgb = RasterConfig(img_width=size, img_height=size, tile_size=32,
                        tile_cap=512, pair_cap=1 << 21, chunk=32,
                        bin_chunk=4096, bin_pairs_per_chunk=16384)
    cfg = Config()
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    gauss = st.params["gauss"]
    camera = _look_at_camera()
    scales = jnp.exp(gauss.scaling)
    quats = gauss.rotation / jnp.linalg.norm(gauss.rotation, axis=-1,
                                             keepdims=True)
    proj = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 32, alive=st.alive,
        opacities=jax.nn.sigmoid(gauss.opacity[:, 0])))(
            gauss.xyz, scales, quats)
    jax.block_until_ready(proj)
    print("total pairs:", int(proj.tiles_touched.sum()))

    n = proj.depth.shape[0]
    g = cfgb.bin_chunk
    pc = cfgb.bin_pairs_per_chunk
    nt = cfgb.num_tiles
    n_chunks = -(-n // g)
    pad = n_chunks * g - n
    total_slots = n_chunks * pc

    def part_argsort(pr):
        visible = pr.tiles_touched > 0
        return jnp.argsort(jnp.where(visible, pr.depth, jnp.inf))

    timeit("argsort", jax.jit(part_argsort), proj)

    def expand(pr):
        visible = pr.tiles_touched > 0
        order = jnp.argsort(jnp.where(visible, pr.depth, jnp.inf))
        rect_min_s = jnp.pad(pr.rect_min[order], ((0, pad), (0, 0)))
        rect_max_s = jnp.pad(pr.rect_max[order], ((0, pad), (0, 0)))
        touched_s = jnp.pad(pr.tiles_touched[order], (0, pad))
        order_p = jnp.pad(order, (0, pad), constant_values=n)
        off = jnp.cumsum(touched_s, dtype=jnp.int32)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), off[:-1]])
        chunk_pair_start = start[::g]
        gauss_chunk = (jnp.arange(n_chunks * g, dtype=jnp.int32) // g)
        g_slot0 = gauss_chunk * pc + (start - chunk_pair_start[gauss_chunk])
        slot_in_budget = (start - chunk_pair_start[gauss_chunk]) < pc
        marks = jnp.zeros((total_slots,), jnp.int32).at[
            jnp.where(slot_in_budget, g_slot0, total_slots)].add(
                1, mode="drop")
        owner = jnp.cumsum(marks) - 1
        owner = jnp.clip(owner, 0, n_chunks * g - 1)
        tbl = jnp.stack(
            [g_slot0, order_p, rect_min_s[:, 0], rect_min_s[:, 1],
             jnp.maximum(rect_max_s[:, 0] - rect_min_s[:, 0], 1),
             touched_s], axis=1)
        row = tbl[owner]
        slots_g = jnp.arange(total_slots, dtype=jnp.int32)
        local = slots_g - row[:, 0]
        valid = (local >= 0) & (local < row[:, 5])
        sx = jnp.maximum(row[:, 4], 1)
        t_ids_all = ((row[:, 3] + local // sx) * cfgb.grid_x
                     + row[:, 2] + local % sx)
        t_ids_all = jnp.where(valid, t_ids_all, 0).reshape(n_chunks, pc)
        oidx_all = jnp.where(valid, row[:, 1], n).reshape(n_chunks, pc)
        return t_ids_all, oidx_all, valid.reshape(n_chunks, pc)

    jexp = jax.jit(expand)
    t_ids_all, oidx_all, valid_all = jexp(proj)
    jax.block_until_ready(t_ids_all)
    timeit("pair expansion (incl argsort)", jexp, proj)

    blk = 256
    n_blk_s = pc // blk
    tril16 = jnp.tril(jnp.ones((blk, blk), jnp.bfloat16))
    t_iota = jnp.arange(nt, dtype=jnp.int32)[None, :]

    def scan_onehot(t_ids_all, oidx_all, valid_all):
        def body(carry, xs):
            counter, n_drop = carry
            t_ids, oidx_p, valid_c = xs
            m = valid_c[:, None] & (t_ids[:, None] == t_iota)
            mb = m.reshape(n_blk_s, blk, nt).astype(jnp.bfloat16)
            incl = jnp.einsum("ij,bjt->bit", tril16, mb,
                              preferred_element_type=jnp.float32)
            bsum = incl[:, blk - 1, :]
            boff = jnp.cumsum(bsum, axis=0) - bsum
            hist = (boff[-1] + bsum[-1]).astype(jnp.int32)
            cc = (incl + (boff + counter[None, :].astype(jnp.float32))
                  [:, None, :]).reshape(pc, nt)
            rank = jnp.where(m, cc, 0.0).sum(axis=1).astype(jnp.int32) - 1
            ok = valid_c & (rank < cfgb.tile_cap) & (rank >= 0)
            dest = jnp.where(ok, t_ids * cfgb.tile_cap + rank,
                             nt * cfgb.tile_cap)
            n_drop = n_drop + (valid_c & ~ok).sum()
            return (counter + hist, n_drop), (dest, oidx_p)

        init = (jnp.zeros((nt,), jnp.int32), jnp.zeros((), jnp.int32))
        return jax.lax.scan(body, init, (t_ids_all, oidx_all, valid_all))

    jso = jax.jit(scan_onehot)
    (cnt1, nd1), (dest1, val1) = jax.block_until_ready(
        jso(t_ids_all, oidx_all, valid_all))
    timeit("scan onehot (current)", jso, t_ids_all, oidx_all, valid_all)

    def scan_onehot2(t_ids_all, oidx_all, valid_all):
        def body(carry, xs):
            counter, n_drop = carry
            t_ids, oidx_p, valid_c = xs
            m = valid_c[:, None] & (t_ids[:, None] == t_iota)
            mb = m.reshape(n_blk_s, blk, nt).astype(jnp.bfloat16)
            # inclusive in-block prefix counts, bf16 (exact <= 256)
            incl = jax.lax.dot_general(
                tril16, mb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16)  # (blk, n_blk_s, nt)
            incl = jnp.moveaxis(incl, 0, 1)           # (n_blk_s, blk, nt)
            bsum = incl[:, blk - 1, :].astype(jnp.float32)
            boff = (jnp.cumsum(bsum, axis=0) - bsum
                    + counter[None, :].astype(jnp.float32))
            hist = (boff[-1] - counter + bsum[-1]).astype(jnp.int32)
            own_incl = (mb * incl).sum(-1)            # (n_blk_s, blk) bf16
            own_base = jnp.einsum("bkt,bt->bk", mb.astype(jnp.float32),
                                  boff)
            rank = (own_incl.astype(jnp.float32) + own_base).astype(
                jnp.int32).reshape(pc) - 1
            ok = valid_c & (rank < cfgb.tile_cap) & (rank >= 0)
            dest = jnp.where(ok, t_ids * cfgb.tile_cap + rank,
                             nt * cfgb.tile_cap)
            n_drop = n_drop + (valid_c & ~ok).sum()
            return (counter + hist, n_drop), (dest, oidx_p)

        init = (jnp.zeros((nt,), jnp.int32), jnp.zeros((), jnp.int32))
        return jax.lax.scan(body, init, (t_ids_all, oidx_all, valid_all))

    jso2 = jax.jit(scan_onehot2)
    (cnt2, nd2), (dest2, val2) = jax.block_until_ready(
        jso2(t_ids_all, oidx_all, valid_all))
    same = bool(jnp.array_equal(dest1, dest2)) and bool(
        jnp.array_equal(cnt1, cnt2))
    print("onehot2 == onehot:", same, " drops:", int(nd1), int(nd2))
    timeit("scan onehot2 (bf16+matvec)", jso2, t_ids_all, oidx_all,
           valid_all)

    def final_scatter(dest_all, val_all):
        return jnp.full((nt * cfgb.tile_cap,), -1, jnp.int32).at[
            dest_all.reshape(-1)].set(val_all.reshape(-1), mode="drop",
                                      unique_indices=True)

    timeit("final scatter", jax.jit(final_scatter), dest1, val1)

    timeit("FULL binner", jax.jit(
        lambda pr: bin_gaussians(pr, cfgb)), proj)


if __name__ == "__main__":
    main()
