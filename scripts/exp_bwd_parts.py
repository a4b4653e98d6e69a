#!/usr/bin/env python
"""In-situ decomposition of the train-step BACKWARD (one-sync/30-step).

Variants stop gradients at different cuts of the full fine step, so the
deltas isolate: deform bwd | regularizer | projection+SH bwd | blend bwd
(kernel + reassociation) | optimizer.
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
    from fourdgs_tpu.models.regularization import compute_regulation
    from fourdgs_tpu.ops import losses, sh as sh_ops, transforms
    from fourdgs_tpu.ops.rasterize_tiled import rasterize
    from fourdgs_tpu.train import loop, optim, state as state_mod
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
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    rcfg = loop.raster_config_from(cfg, size, size)
    dcfg = deform_config_from(cfg)
    camera = _look_at_camera()
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)
    REG = (0.01, 1e-4, 1e-4)

    def fwd(params, seed, *, sg_deform=False, sg_proj=False, with_reg=True):
        gauss = params["gauss"]
        xyz, scaling, rotation, opacity, shs = deform_apply(
            params["deform"], dcfg, st.aabb, gauss.xyz, gauss.scaling,
            gauss.rotation, gauss.opacity, gauss.features(), jnp.float32(0.5))
        if sg_deform:
            xyz, scaling, rotation, opacity, shs = jax.tree.map(
                jax.lax.stop_gradient,
                (xyz, scaling, rotation, opacity, shs))
        scales = transforms.safe_exp_scales(scaling)
        quats = transforms.quat_normalize(rotation)
        opac = jax.nn.sigmoid(opacity[:, 0])
        dirs = xyz - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = sh_ops.sh_to_rgb(3, shs, dirs)
        if sg_proj:
            xyz, scales, quats, opac, colors = jax.tree.map(
                jax.lax.stop_gradient, (xyz, scales, quats, opac, colors))
        out = rasterize(xyz, scales, quats, opac, colors, camera, bg, rcfg,
                        alive=st.alive, scale_modifier=1.0 + seed)
        l1 = losses.l1_loss(out.color, gt)
        loss = l1
        if with_reg:
            loss = loss + compute_regulation(params["deform"]["grid"], *REG)
        return loss

    def make_step(**kw):
        def f(state, seed):
            loss, grads = jax.value_and_grad(
                lambda p: fwd(p, seed, **kw))(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            # keep the loss live so stop_gradient cuts can't DCE the fwd
            return state._replace(params=params, opt_state=opt_state,
                                  step=state.step + (loss > -1.0))
        return f

    def fwd_only(state, seed):
        return state._replace(step=state.step + (
            fwd(state.params, seed) > -1.0).astype(jnp.int32))

    def bench(name, fn, iters=30):
        f = jax.jit(fn)
        s = f(st, jnp.float32(0.0))
        jax.block_until_ready(s.step)
        for i in range(3):
            s = f(st, jnp.float32(i) * 1e-7)
        jax.block_until_ready(s.step)
        t0 = time.perf_counter()
        for i in range(iters):
            s = f(st, jnp.float32(i) * 1e-7)
        np.asarray(s.step)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    def raster_loss_from(dvars, seed):
        xyz, scaling, rotation, opacity, shs = dvars
        scales = transforms.safe_exp_scales(scaling)
        quats = transforms.quat_normalize(rotation)
        opac = jax.nn.sigmoid(opacity[:, 0])
        dirs = xyz - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = sh_ops.sh_to_rgb(3, shs, dirs)
        out = rasterize(xyz, scales, quats, opac, colors, camera, bg, rcfg,
                        alive=st.alive, scale_modifier=1.0 + seed)
        return losses.l1_loss(out.color, gt)

    def step_raster_grad(state, seed):
        """deform fwd (detached) + raster fwd + raster bwd; no deform bwd."""
        gauss = state.params["gauss"]
        d = deform_apply(state.params["deform"], dcfg, st.aabb, gauss.xyz,
                         gauss.scaling, gauss.rotation, gauss.opacity,
                         gauss.features(), jnp.float32(0.5))
        d = jax.tree.map(jax.lax.stop_gradient, d)
        loss, g = jax.value_and_grad(
            lambda dv: raster_loss_from(dv, seed))(d)
        tick = loss + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-20
        return state._replace(step=state.step + (tick > -1.0))

    def step_blend_grad(state, seed):
        """like step_raster_grad but grads stop at the blend inputs:
        isolates blend bwd kernel + grad reassociation from proj/SH bwd."""
        gauss = state.params["gauss"]
        d = deform_apply(state.params["deform"], dcfg, st.aabb, gauss.xyz,
                         gauss.scaling, gauss.rotation, gauss.opacity,
                         gauss.features(), jnp.float32(0.5))
        xyz, scaling, rotation, opacity, shs = jax.tree.map(
            jax.lax.stop_gradient, d)
        scales = transforms.safe_exp_scales(scaling)
        quats = transforms.quat_normalize(rotation)
        opac = jax.nn.sigmoid(opacity[:, 0])
        dirs = xyz - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        colors = sh_ops.sh_to_rgb(3, shs, dirs)

        def blend_loss(cv):
            opac_v, colors_v = cv
            out = rasterize(xyz, scales, quats, opac_v, colors_v, camera,
                            bg, rcfg, alive=st.alive,
                            scale_modifier=1.0 + seed)
            return losses.l1_loss(out.color, gt)

        loss, g = jax.value_and_grad(blend_loss)((opac, colors))
        tick = loss + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-20
        return state._replace(step=state.step + (tick > -1.0))

    t_full = bench("FULL fwd+bwd+opt", make_step())
    t_noreg = bench("no regularizer", make_step(with_reg=False))
    t_rast = bench("raster bwd only (deform detached)", step_raster_grad)
    t_blend = bench("blend bwd only (opac/colors grads)", step_blend_grad)
    t_fwd = bench("fwd only (loss, no grad)", fwd_only)
    print()
    print(f"regularizer bwd+fwd : {t_full - t_noreg:7.2f} ms")
    print(f"deform bwd (+opt)   : {t_full - t_rast:7.2f} ms")
    print(f"proj+SH+activ bwd   : {t_rast - t_blend:7.2f} ms")
    print(f"blend bwd+reassoc   : {t_blend - t_fwd:7.2f} ms")
    print(f"forward             : {t_fwd:7.2f} ms")


if __name__ == "__main__":
    main()
