#!/usr/bin/env python
"""Micro-profile of binner internals + blend-bwd internals (dev tool).

Separates: depth argsort, hoisted pair expansion, mask+cumsum scan, final
scatter; and for the backward: Pallas grad kernel vs the XLA scatter-add.
Timing per the repo protocol: ~30 iters, one hard host sync at the end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops.pallas import blend as pallas_blend
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops import sh as sh_ops
    from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                                 _tile_pixel_coords,
                                                 bin_gaussians)
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams

    n_points = int(os.environ.get("PROF_POINTS", 100_000))
    size = int(os.environ.get("PROF_SIZE", 800))
    cfg = Config()
    cap = 1 << (n_points - 1).bit_length()
    raster_cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                              tile_cap=768, pair_cap=1 << 21, chunk=32,
                              backend="auto")
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    gauss = st.params["gauss"]
    camera = _look_at_camera()
    scales = jnp.exp(gauss.scaling)
    quats = gauss.rotation / jnp.linalg.norm(gauss.rotation, axis=-1,
                                             keepdims=True)
    opac = jax.nn.sigmoid(gauss.opacity[:, 0])
    shs = gauss.features()
    dirs = gauss.xyz / jnp.maximum(
        jnp.linalg.norm(gauss.xyz, axis=-1, keepdims=True), 1e-8)
    colors = sh_ops.sh_to_rgb(3, shs, dirs)

    proj = jax.jit(lambda p, s, q: project_gaussians(
        p, s, q, camera, size, size, 16, alive=st.alive))(
            gauss.xyz, scales, quats)
    jax.block_until_ready(proj)

    cfgb = raster_cfg

    # --- binner parts ---
    def part_argsort(pr):
        visible = pr.tiles_touched > 0
        return jnp.argsort(jnp.where(visible, pr.depth, jnp.inf))

    timeit("bin: depth argsort", jax.jit(part_argsort), proj)

    n = proj.depth.shape[0]
    g = cfgb.bin_chunk
    pc = cfgb.bin_pairs_per_chunk
    n_chunks = -(-n // g)
    pad = n_chunks * g - n

    def part_expand(pr):
        visible = pr.tiles_touched > 0
        order = jnp.argsort(jnp.where(visible, pr.depth, jnp.inf))
        rect_min_s = jnp.pad(pr.rect_min[order], ((0, pad), (0, 0)))
        rect_max_s = jnp.pad(pr.rect_max[order], ((0, pad), (0, 0)))
        touched_s = jnp.pad(pr.tiles_touched[order], (0, pad))
        order_p = jnp.pad(order, (0, pad), constant_values=n)
        total_slots = n_chunks * pc
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
        return row

    timeit("bin: pair expansion (argsort+gather)", jax.jit(part_expand), proj)

    timeit("bin: FULL", jax.jit(lambda pr: bin_gaussians(pr, cfgb)), proj)

    binned = jax.jit(lambda pr: bin_gaussians(pr, cfgb))(proj)
    jax.block_until_ready(binned)

    # --- blend bwd parts ---
    blend = pallas_blend.make_blend(cfgb)
    px, py = _tile_pixel_coords(cfgb)

    pack = jax.jit(lambda: pallas_blend._pack_attrs(
        binned.gidx, proj.pix, proj.conic, colors, opac, proj.depth))
    attrs = pack()
    timeit("bwd: pack_attrs", pack)

    need_fn = jax.jit(lambda: pallas_blend.make_blend(cfgb) and None)

    # forward output for cotangents
    fwd = jax.jit(lambda: blend(binned.gidx, px, py, proj.pix, proj.conic,
                                colors, opac, proj.depth))
    out = fwd()
    timeit("bwd: fwd total", fwd)

    # full fwd+bwd
    def floss(pix, conic, c, o, d):
        ct, dt_, tt = blend(binned.gidx, px, py, pix, conic, c, o, d)
        return ct.sum() + dt_.sum() + tt.sum()

    fb = jax.jit(jax.grad(floss, argnums=(0, 1, 2, 3, 4)))
    timeit("bwd: fwd+bwd total", fb, proj.pix, proj.conic, colors, opac,
           proj.depth)

    # isolate the scatter-add
    nt = cfgb.num_tiles
    grads_fake = jnp.ones((nt, cfgb.tile_cap, pallas_blend.ATTR_W),
                          jnp.float32)

    def scat(g2):
        flat = binned.gidx.reshape(-1)
        flat_idx = jnp.where(flat >= 0, flat, n)
        acc = jnp.zeros((n + 1, pallas_blend.ATTR_W), jnp.float32).at[
            flat_idx].add(g2.reshape(-1, pallas_blend.ATTR_W), mode="drop")
        return acc

    timeit("bwd: scatter-add alone", jax.jit(scat), grads_fake)


if __name__ == "__main__":
    main()
