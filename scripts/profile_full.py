#!/usr/bin/env python
"""Full-stage breakdown of the bench-config train step (dev tool).

Times every stage of the fine train step at the bench operating point
(D-NeRF hexplane config, 100k points, 800x800) so optimization effort goes
where the milliseconds are.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import sync


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    sync(out)                     # honest sync (see scripts/_timing.py)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms",
          flush=True)


def main():
    from __graft_entry__ import _look_at_camera, _synthetic_scene
    from fourdgs_tpu.models.deformation import deform_apply
    from fourdgs_tpu.models.hexplane import hexplane_features, normalize_aabb
    from fourdgs_tpu.ops import sh as sh_ops
    from fourdgs_tpu.ops.pallas import blend as pallas_blend
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_tiled import (_tile_pixel_coords,
                                                 bin_gaussians)
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.config import Config, RasterParams
    from fourdgs_tpu.train.state import deform_config_from

    n_points = int(os.environ.get("PROF_POINTS", 100_000))
    size = int(os.environ.get("PROF_SIZE", 800))
    ts = int(os.environ.get("PROF_TILE", 32))   # bench default
    tc = int(os.environ.get("PROF_TILE_CAP", 512))  # bench default
    cfg = Config()
    cfg.hidden.multires = [1, 2]
    cfg.hidden.defor_depth = 0
    cfg.hidden.net_width = 64
    cap = loop.pick_bucket(n_points, 1 << 22, headroom=1.0)
    cfg.raster = RasterParams(
        capacity=cap, tile_size=ts, tile_cap=tc, pair_cap=1 << 21, chunk=32,
        backend="auto",
        bin_chunk=int(os.environ.get("PROF_BIN_CHUNK", 4096)),
        bin_pairs_per_chunk=int(os.environ.get("PROF_BIN_PC", 18432)))
    pts, cols = _synthetic_scene(n_points)
    st = state_mod.create_state(jax.random.key(0), cfg, pts, cols,
                                spatial_lr_scale=1.0)
    st = loop.compact_and_resize(st, cap)
    tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    deform_cfg = deform_config_from(cfg)
    camera = _look_at_camera()
    raster_cfg = loop.raster_config_from(cfg, size, size)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)), jnp.float32)
    bg = jnp.zeros(3)

    gauss = st.params["gauss"]
    shs = gauss.features()
    print(f"points={n_points} cap={cap} size={size} "
          f"device={jax.devices()[0]}", flush=True)

    # --- deformation ---
    def hex_feats(grids):
        pn = normalize_aabb(gauss.xyz, st.aabb)
        return hexplane_features(grids, deform_cfg.grid, pn,
                                 jnp.full((cap,), 0.5))

    timeit("hexplane fwd", jax.jit(hex_feats), st.params["deform"]["grid"])
    timeit("hexplane fwd+bwd",
           jax.jit(jax.grad(lambda g: hex_feats(g).sum())),
           st.params["deform"]["grid"])

    def deform_loss(dparams):
        out = deform_apply(dparams, deform_cfg, st.aabb, gauss.xyz,
                           gauss.scaling, gauss.rotation, gauss.opacity,
                           shs, jnp.float32(0.5))
        return sum(o.sum() for o in out)

    timeit("deform fwd", jax.jit(deform_loss), st.params["deform"])
    timeit("deform fwd+bwd", jax.jit(jax.grad(deform_loss)),
           st.params["deform"])

    # --- SH ---
    dirs = gauss.xyz / jnp.maximum(
        jnp.linalg.norm(gauss.xyz, axis=-1, keepdims=True), 1e-8)

    def sh_loss(s):
        return sh_ops.sh_to_rgb(3, s, dirs).sum()

    timeit("sh fwd+bwd", jax.jit(jax.grad(sh_loss)), shs)

    # --- rasterizer stages ---
    scales = jnp.exp(gauss.scaling)
    quats = gauss.rotation / jnp.linalg.norm(gauss.rotation, axis=-1,
                                             keepdims=True)
    opac = jax.nn.sigmoid(gauss.opacity[:, 0])
    colors = sh_ops.sh_to_rgb(3, shs, dirs)

    proj_fn = jax.jit(lambda p, s, q, o: project_gaussians(
        p, s, q, camera, size, size, ts, alive=st.alive, opacities=o))
    proj = proj_fn(gauss.xyz, scales, quats, opac)
    timeit("projection fwd", proj_fn, gauss.xyz, scales, quats, opac)

    bin_fn = jax.jit(lambda pr: bin_gaussians(pr, raster_cfg))
    binned = bin_fn(proj)
    print(f"  pairs={int(binned.num_pairs)} "
          f"dropped={int(binned.dropped_pairs)}/{int(binned.dropped_tile)} "
          f"max_tile={int(binned.counts.max())} "
          f"mean_tile={float(binned.counts.mean()):.1f} "
          f"zero_tiles={int((binned.counts == 0).sum())}/{binned.counts.shape[0]}",
          flush=True)
    timeit("binner", bin_fn, proj)

    pack_fn = jax.jit(lambda g, pr, c, o: pallas_blend._pack_attrs(
        g, pr.pix, pr.conic, c, o, pr.depth))
    attrs = pack_fn(binned.gidx, proj, colors, opac)
    timeit("pack_attrs gather", pack_fn, binned.gidx, proj, colors, opac)

    px, py = _tile_pixel_coords(raster_cfg)
    blend = pallas_blend.make_blend(raster_cfg)
    blend_fwd_fn = jax.jit(lambda g, pr, c, o: blend(
        g, px, py, pr.pix, pr.conic, c, o, pr.depth))
    timeit("blend fwd (pack+kernel)", blend_fwd_fn, binned.gidx, proj,
           colors, opac)

    def blend_loss(g_, pix, conic, c, o, d):
        ct, dt_, tt = blend(g_, px, py, pix, conic, c, o, d)
        return ct.sum() + dt_.sum() + tt.sum()

    bb = jax.jit(jax.grad(blend_loss, argnums=(1, 2, 3, 4, 5)))
    timeit("blend fwd+bwd (pack+kern+scatter)", bb, binned.gidx, proj.pix,
           proj.conic, colors, opac, proj.depth)

    # --- optimizer ---
    def opt_update(params, opt_state):
        grads = jax.tree.map(jnp.ones_like, params)
        return tx.update(grads, opt_state, params)

    timeit("optimizer update", jax.jit(opt_update), st.params, st.opt_state)

    # --- full steps ---
    cameras = jax.tree.map(lambda x: x[None], camera)

    def full(state, stage):
        return loop.train_step(
            state, cameras, gts, bg, jnp.int32(3), stage=stage,
            raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
            lambda_dssim=0.0, reg_weights=(0.01, 1e-4, 1e-4),
            track_stats=True)

    timeit("FULL fine step", jax.jit(lambda s: full(s, "fine")), st)
    timeit("FULL coarse step", jax.jit(lambda s: full(s, "coarse")), st)


if __name__ == "__main__":
    main()
