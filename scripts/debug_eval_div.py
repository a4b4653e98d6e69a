#!/usr/bin/env python
"""Reproduce the in-loop eval vs training-path PSNR divergence (VERDICT r4
Weak #1) by rendering the SAME live state through both paths on the same
views and diffing."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.data.scene import Scene
    from fourdgs_tpu.ops import losses
    from fourdgs_tpu.train import config as config_mod
    from fourdgs_tpu.train import loop, optim, state as state_mod
    from fourdgs_tpu.train.state import deform_config_from
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    cfg = config_mod.Config()
    cfg = config_mod.apply_config_file(
        cfg, "fourdgs_tpu/configs/dnerf/synth_mv.py")
    cfg.model.source_path = os.path.abspath("data/synth_mv")
    cfg.model.model_path = "/tmp/debug_eval_div"
    os.makedirs(cfg.model.model_path, exist_ok=True)

    np.random.seed(cfg.seed)
    scene = Scene.load(cfg.model.source_path,
                       white_background=cfg.model.white_background,
                       eval_split=cfg.model.eval,
                       extension=cfg.model.extension,
                       downscale=1)
    print(f"type={scene.dataset_type} train={len(scene.train)} "
          f"test={len(scene.test)}")

    pcd = scene.info.point_cloud
    key = jax.random.key(cfg.seed)
    st = state_mod.create_state(key, cfg, pcd.points, pcd.colors,
                                spatial_lr_scale=scene.cameras_extent,
                                aabb=scene.aabb)
    st = loop.compact_and_resize(
        st, loop.pick_bucket(int(st.alive.sum()), cfg.raster.capacity))
    tx = optim.build_optimizer(cfg.opt, scene.cameras_extent, st.params)
    st = st._replace(opt_state=tx.init(st.params))

    raster_cfg = loop.raster_config_from(cfg, scene.train.width,
                                         scene.train.height)
    deform_cfg = deform_config_from(cfg)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    rng = np.random.default_rng(cfg.seed)

    coarse_iters = int(os.environ.get("DBG_COARSE", "1000"))
    fine_iters = int(os.environ.get("DBG_FINE", "1500"))
    active_sh = 0
    rcfg = raster_cfg
    stage = "coarse"
    for stage, iters in (("coarse", coarse_iters), ("fine", fine_iters)):
        if not iters:
            continue
        tx = optim.build_optimizer(cfg.opt, scene.cameras_extent, st.params)
        st = st._replace(opt_state=tx.init(st.params),
                         step=jnp.zeros([], jnp.int32))
        res = loop.run_stage(
            cfg, st, stage, iters, scene.train.cameras, scene.train.images,
            tx, rcfg, rng=rng, key=jax.random.key(cfg.seed),
            log_fn=lambda r: print(f"[{r['stage']} {r['iter']}] "
                                   f"loss={r['loss']:.4f} "
                                   f"psnr={r['psnr']:.2f}"),
            cameras_extent=scene.cameras_extent,
            initial_active_sh=active_sh)
        st = res.state
        active_sh = res.active_sh
        rcfg = res.raster_cfg or rcfg
    print(f"stage done, active_sh={active_sh}, capacity={st.capacity}")

    reg_weights = (cfg.hidden.time_smoothness_weight,
                   cfg.hidden.l1_time_planes, cfg.hidden.plane_tv_weight)

    print("\nview | train_step psnr | eval_step psnr | img maxdiff")
    for i in [0, 1, 40, 80, 140]:
        idxs = np.array([i])
        cams = jax.tree.map(lambda a: a[idxs], scene.train.cameras)
        gts = scene.train.images[idxs]
        _, aux = loop.train_step(
            st, cams, gts, bg, jnp.int32(active_sh), stage=stage,
            raster_cfg=rcfg, deform_cfg=deform_cfg, tx=tx,
            lambda_dssim=float(cfg.opt.lambda_dssim),
            reg_weights=reg_weights, track_stats=True)
        train_img = np.asarray(aux.image)
        train_psnr = float(aux.psnr)

        cam = jax.tree.map(lambda a: a[i], scene.train.cameras)
        out = loop.eval_step(st, cam, bg, stage=stage,
                             active_sh=int(active_sh), raster_cfg=rcfg,
                             deform_cfg=deform_cfg)
        eval_img = np.asarray(jnp.clip(out.color, 0, 1))
        gt = np.asarray(scene.train.images[i])
        eval_psnr = float(losses.psnr(jnp.asarray(eval_img),
                                      jnp.asarray(gt))[0])
        maxdiff = float(np.abs(np.clip(train_img, 0, 1) - eval_img).max())
        print(f"{i:4d} | {train_psnr:10.2f} | {eval_psnr:10.2f} | "
              f"{maxdiff:.4f}  drops=({int(out.dropped_pairs)},"
              f"{int(out.dropped_tile)})")

    # test views through eval path
    print("\ntest views (eval path):")
    ps = []
    for i in range(0, len(scene.test), 6):
        cam = jax.tree.map(lambda a: a[i], scene.test.cameras)
        out = loop.eval_step(st, cam, bg, stage=stage,
                             active_sh=int(active_sh), raster_cfg=rcfg,
                             deform_cfg=deform_cfg)
        img = jnp.clip(out.color, 0, 1)
        p = float(losses.psnr(img, scene.test.images[i])[0])
        ps.append(p)
        print(f"  test[{i}] psnr={p:.2f}")
    print(f"mean test psnr: {np.mean(ps):.2f}")

    # snapshot round-trip: save live state, restore the way render.py does,
    # re-render the same views, compare (the post-hoc CLI path)
    from fourdgs_tpu.models.deformation import init_deform
    from fourdgs_tpu.render.render import render as render_fn
    from fourdgs_tpu.train import checkpoint
    snap = checkpoint.save_snapshot(st, cfg.model.model_path, 99999, stage)
    gauss, alive, deform_flat, aabb2 = \
        checkpoint.restore_gaussians_from_snapshot(
            snap, cap=1, max_sh_degree=cfg.model.sh_degree)
    template = init_deform(jax.random.key(0), deform_cfg)
    deform_params = checkpoint.deform_params_from_flat(template, deform_flat)
    print("\nsnapshot round-trip renders (render.py path, stage='fine', "
          f"sh={cfg.model.sh_degree}):")
    for split_name, split in (("train", scene.train), ("test", scene.test)):
        for i in (0, 1):
            cam = jax.tree.map(lambda a: a[i], split.cameras)
            out2 = render_fn(gauss, deform_params, cam, bg, rcfg,
                             deform_cfg, jnp.asarray(aabb2), alive,
                             cfg.model.sh_degree, stage="fine")
            img2 = jnp.clip(out2.color, 0, 1)
            p = float(losses.psnr(img2, split.images[i])[0])
            print(f"  {split_name}[{i}] snapshot-render psnr={p:.2f} "
                  f"drops=({int(out2.dropped_pairs)},"
                  f"{int(out2.dropped_tile)})")


if __name__ == "__main__":
    main()
