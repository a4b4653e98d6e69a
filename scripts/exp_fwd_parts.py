#!/usr/bin/env python
"""In-situ decomposition of the 51 ms bench FORWARD (30-step/one-sync).

Each variant runs the forward prefix up to a cut point; differences give
the pipelined cost of each stage: deform+proj+sh | binner | pack gather |
blend kernel.
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
    from fourdgs_tpu.ops import transforms
    from fourdgs_tpu.ops.pallas import blend as pallas_blend
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (_tile_pixel_coords,
                                                 bin_gaussians)
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points = 100_000
    size = 800
    cap = 131072
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cfg.raster = RasterParams(capacity=cap, tile_size=32, tile_cap=1536,
                              pair_cap=1 << 21, chunk=32, backend="auto",
                              bin_pairs_per_chunk=16384)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    rcfg = loop.raster_config_from(cfg, size, size)
    dcfg = deform_config_from(cfg)
    camera = _look_at_camera()
    bg = jnp.zeros(3)

    gauss = st.params["gauss"]
    deform = st.params["deform"]
    aabb, alive = st.aabb, st.alive

    def front(g, seed):
        """deform + activations + sh + projection. seed varies xyz slightly
        so steps aren't CSE'd across iterations."""
        shs = g.xyz[:, :1, None] * 0 + gauss.features()
        xyz, scaling, rotation, opacity, shs_f = deform_apply(
            deform, dcfg, aabb, g.xyz + seed, g.scaling, g.rotation,
            g.opacity, shs, jnp.float32(0.5))
        scales = transforms.safe_exp_scales(scaling)
        quats = transforms.quat_normalize(rotation)
        opacities = jax.nn.sigmoid(opacity[:, 0])
        dirs = xyz - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = sh_ops.sh_to_rgb(3, shs_f, dirs)
        proj = project_gaussians(xyz, scales, quats, camera, size, size,
                                 rcfg.tile_size, alive=alive,
                                 opacities=opacities)
        return proj, colors, opacities

    def v_front(seed):
        proj, colors, opacities = front(gauss, seed)
        return (proj.pix.sum() + proj.conic.sum() + colors.sum()
                + proj.tiles_touched.sum())

    def v_coarse_front(seed):
        shs = gauss.features()
        scales = transforms.safe_exp_scales(gauss.scaling)
        quats = transforms.quat_normalize(gauss.rotation)
        opacities = jax.nn.sigmoid(gauss.opacity[:, 0] + seed)
        dirs = gauss.xyz - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = sh_ops.sh_to_rgb(3, shs, dirs)
        proj = project_gaussians(gauss.xyz, scales, quats, camera, size,
                                 size, rcfg.tile_size, alive=alive,
                                 opacities=opacities)
        return (proj.pix.sum() + proj.conic.sum() + colors.sum()
                + proj.tiles_touched.sum())

    def v_binner(seed):
        proj, colors, opacities = front(gauss, seed)
        binned = bin_gaussians(proj, rcfg)
        return (binned.gidx.sum() + binned.counts.sum()
                + binned.slots.dest.sum() + colors.sum() + opacities.sum())

    def v_pack(seed):
        proj, colors, opacities = front(gauss, seed)
        binned = bin_gaussians(proj, rcfg)
        attrs = pallas_blend._pack_attrs(binned.gidx, proj.pix, proj.conic,
                                         colors, opacities, proj.depth)
        return attrs.sum()

    def v_full(seed):
        proj, colors, opacities = front(gauss, seed)
        binned = bin_gaussians(proj, rcfg)
        blend_fn = pallas_blend.make_blend(rcfg)
        px, py = _tile_pixel_coords(rcfg)
        color_t, depth_t, t_t = blend_fn(
            binned.gidx, px, py, proj.pix, proj.conic, colors, opacities,
            proj.depth, binned.slots)
        return color_t.sum() + depth_t.sum() + t_t.sum()

    def bench(name, fn, iters=30):
        f = jax.jit(fn)
        out = f(jnp.float32(0.0))
        jax.block_until_ready(out)
        for i in range(3):
            out = f(jnp.float32(i) * 1e-6)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(jnp.float32(i) * 1e-6)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:40s} {dt:8.2f} ms", flush=True)
        return dt

    t_cf = bench("coarse front (proj+sh, no deform)", v_coarse_front)
    t_f = bench("front (deform+proj+sh)", v_front)
    t_b = bench("front + binner", v_binner)
    t_p = bench("front + binner + pack gather", v_pack)
    t_full = bench("front + binner + pack + blend fwd", v_full)
    print()
    print(f"deform fwd       : {t_f - t_cf:7.2f} ms")
    print(f"binner           : {t_b - t_f:7.2f} ms")
    print(f"pack gather      : {t_p - t_b:7.2f} ms")
    print(f"blend fwd kernel : {t_full - t_p:7.2f} ms")


if __name__ == "__main__" and not os.environ.get("VMAP_CHECK"):
    main()


def vmap_check():
    """Is vmap over a batch-1 camera axis pessimizing the binner?"""
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import time as _t

    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.ops import losses
    from fourdgs_tpu.render.render import render
    from fourdgs_tpu.train import loop, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points, size, cap = 100_000, 800, 131072
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cfg.raster = RasterParams(capacity=cap, tile_size=32, tile_cap=1536,
                              pair_cap=1 << 21, chunk=32, backend="auto",
                              bin_pairs_per_chunk=16384)
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    rcfg = loop.raster_config_from(cfg, size, size)
    dcfg = deform_config_from(cfg)
    camera = _look_at_camera()
    cameras = jax.tree.map(lambda x: x[None], camera)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)

    def render_one(cam, seed):
        return render(st.params["gauss"], st.params["deform"], cam, bg,
                      rcfg, dcfg, st.aabb, st.alive, 3, stage="fine",
                      ndc_offset=None, scale_modifier=1.0 + seed)

    def f_vmap(seed):
        outs = jax.vmap(lambda c: render_one(c, seed))(cameras)
        return losses.l1_loss(outs.color, gts)

    def f_flat(seed):
        out = render_one(camera, seed)
        return losses.l1_loss(out.color[None], gts)

    def bench(name, fn, iters=30):
        f = jax.jit(fn)
        out = f(jnp.float32(0.0))
        jax.block_until_ready(out)
        for i in range(3):
            out = f(jnp.float32(i) * 1e-7)
        jax.block_until_ready(out)
        t0 = _t.perf_counter()
        for i in range(iters):
            out = f(jnp.float32(i) * 1e-7)
        jax.block_until_ready(out)
        print(f"{name:30s} {(_t.perf_counter()-t0)/iters*1000:8.2f} ms",
              flush=True)

    bench("render fwd, vmap batch=1", f_vmap)
    bench("render fwd, no vmap", f_flat)


if __name__ == "__main__" and os.environ.get("VMAP_CHECK"):
    vmap_check()
