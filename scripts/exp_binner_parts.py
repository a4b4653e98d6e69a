#!/usr/bin/env python
"""In-situ decomposition of the ~18 ms counting binner (one-sync/30-step).

Cuts the binner at each internal stage on top of the projection front so
deltas give pipelined per-stage costs: depth argsort | hoisted pair
expansion | chunk scan (mask+cumsum+rank) | final unique scatter.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.models.deformation import deform_apply
    from fourdgs_tpu.ops import sh as sh_ops
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops import rasterize_tiled as rt
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points, size, cap = 100_000, 800, 131072
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cfg.raster = RasterParams(capacity=cap, tile_size=32, tile_cap=512,
                              pair_cap=1 << 21, chunk=32, backend="auto",
                              bin_pairs_per_chunk=16384)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    rcfg = loop.raster_config_from(cfg, size, size)
    dcfg = deform_config_from(cfg)
    camera = _look_at_camera()
    gauss = st.params["gauss"]

    from fourdgs_tpu.ops import transforms

    def front(seed):
        xyz, scaling, rotation, opacity, shs = deform_apply(
            st.params["deform"], dcfg, st.aabb, gauss.xyz, gauss.scaling,
            gauss.rotation, gauss.opacity, gauss.features(),
            jnp.float32(0.5))
        scales = transforms.safe_exp_scales(scaling)
        quats = transforms.quat_normalize(rotation)
        opac = jax.nn.sigmoid(opacity[:, 0])
        proj = project_gaussians(xyz, scales, quats, camera, rcfg.img_width,
                                 rcfg.img_height, rcfg.tile_size,
                                 alive=st.alive,
                                 scale_modifier=1.0 + seed,
                                 opacities=opac)
        return proj, opac

    g = rcfg.bin_chunk
    pc = rcfg.bin_pairs_per_chunk
    nt = rcfg.num_tiles

    def v_front(seed):
        proj, opac = front(seed)
        return proj.depth.sum() + proj.rect_min.sum() + proj.tiles_touched.sum()

    def v_sort(seed):
        proj, opac = front(seed)
        visible = proj.tiles_touched > 0
        order = jnp.argsort(jnp.where(visible, proj.depth, jnp.inf))
        return order.sum()

    def v_expansion(seed):
        """sort + the hoisted pair expansion, stop before the scan."""
        proj, _ = front(seed)
        n = proj.depth.shape[0]
        n_chunks = -(-n // g)
        pad = n_chunks * g - n
        visible = proj.tiles_touched > 0
        order = jnp.argsort(jnp.where(visible, proj.depth, jnp.inf))
        rect_min_s = jnp.pad(proj.rect_min[order], ((0, pad), (0, 0)))
        rect_max_s = jnp.pad(proj.rect_max[order], ((0, pad), (0, 0)))
        touched_s = jnp.pad(proj.tiles_touched[order], (0, pad))
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
        slots_g = jnp.arange(total_slots, dtype=jnp.int32)
        local = slots_g - row[:, 0]
        valid = (local >= 0) & (local < row[:, 5])
        sx = row[:, 4]
        t_ids_all = ((row[:, 3] + local // sx) * rcfg.grid_x
                     + row[:, 2] + local % sx)
        t_ids_all = jnp.where(valid, t_ids_all, 0)
        oidx_all = jnp.where(valid, row[:, 1], n)
        return t_ids_all.sum() + oidx_all.sum() + (owner.sum() & 1)

    def v_binned(seed):
        proj, _ = front(seed)
        binned = rt.bin_gaussians(proj, rcfg)
        return (binned.gidx.sum() + binned.counts.sum()
                + binned.slots.dest.sum())

    def v_binned_noscatter(seed):
        """Full binner minus the final unique scatter (consume dest/val)."""
        proj, _ = front(seed)
        binned = rt.bin_gaussians(proj, rcfg)
        # touch dest_all through slots.dest, and counts — but NOT gidx
        return binned.counts.sum() + binned.slots.dest.sum()

    def bench(name, fn, iters=30):
        f = jax.jit(fn)
        out = f(jnp.float32(0.0))
        jax.block_until_ready(out)
        for i in range(3):
            out = f(jnp.float32(i) * 1e-7)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(jnp.float32(i) * 1e-7)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    t0_ = bench("front (deform+proj)", v_front)
    t1 = bench("front + depth argsort", v_sort)
    t2 = bench("front + sort + pair expansion", v_expansion)
    t4 = bench("front + FULL binner", v_binned)
    t3 = bench("front + binner minus gidx consumption", v_binned_noscatter)
    print()
    print(f"argsort          : {t1 - t0_:7.2f} ms")
    print(f"pair expansion   : {t2 - t1:7.2f} ms")
    print(f"scan + scatter   : {t4 - t2:7.2f} ms")
    print(f"(dce'd scatter)  : {t4 - t3:7.2f} ms")


if __name__ == "__main__":
    main()
