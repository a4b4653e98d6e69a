#!/usr/bin/env python
"""Rendering CLI: render train/test/video splits from a trained model and
measure FPS (mirrors ref render.py:46-114: per-split renders/ + gt/ PNG
dirs, FPS over the split, video mp4 when imageio is available)."""
from __future__ import annotations

import argparse
import concurrent.futures
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_png(path, arr):
    from PIL import Image
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def main():
    parser = argparse.ArgumentParser(description="4DGS-TPU rendering")
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("-s", "--source_path", default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_video", action="store_true")
    parser.add_argument("--configs", default="")
    parser.add_argument("--mesh", default="",
                        help="render tile-sharded over a multi-chip mesh "
                             "'data,tile' (e.g. '1,8'); the per-gaussian "
                             "pipeline and blend split across 'tile'")
    args = parser.parse_args()

    from fourdgs_tpu.train import config as config_mod
    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    cfg = config_mod.load_cfg(cfg_path) if os.path.exists(cfg_path) \
        else config_mod.Config()
    if args.configs:
        cfg = config_mod.apply_config_file(cfg, args.configs)
    source = args.source_path or cfg.model.source_path

    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from fourdgs_tpu.data.scene import Scene
    from fourdgs_tpu.models.deformation import init_deform
    from fourdgs_tpu.train import checkpoint, loop, state as state_mod
    from fourdgs_tpu.train.state import TrainState, deform_config_from

    scene = Scene.load(source, white_background=cfg.model.white_background,
                       eval_split=cfg.model.eval,
                       extension=cfg.model.extension)

    snap_dir, it = checkpoint.find_latest_snapshot(args.model_path,
                                                   args.iteration)
    print(f"rendering snapshot {snap_dir}")
    gauss, alive, deform_flat, aabb = \
        checkpoint.restore_gaussians_from_snapshot(
            snap_dir, cap=1, max_sh_degree=cfg.model.sh_degree)
    deform_cfg = deform_config_from(cfg)
    template = init_deform(jax.random.key(0), deform_cfg)
    deform_params = checkpoint.deform_params_from_flat(template, deform_flat)
    params = {"gauss": gauss, "deform": deform_params}

    raster_cfg = loop.raster_config_from(cfg, scene.train.width,
                                         scene.train.height)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    from fourdgs_tpu.render.render import render as render_fn

    # Cap probe: the snapshot may hold far more gaussians than the saved
    # config's binner caps were sized for (training auto-grows its caps,
    # cfg_args keeps the startup values) — render with overflowing caps and
    # the furthest splats silently vanish. Probe one view and double the
    # overflowing cap until drop-free.
    import dataclasses as _dc
    probe_cam = jax.tree.map(lambda a: a[0], scene.train.cameras)
    for _ in range(5):
        probe = render_fn(params["gauss"], params["deform"], probe_cam, bg,
                          raster_cfg, deform_cfg, jnp.asarray(aabb), alive,
                          cfg.model.sh_degree, stage="fine")
        dp, dt = int(probe.dropped_pairs), int(probe.dropped_tile)
        dt_thresh = max(64, int(probe.num_pairs) // 200)
        if not (dp or dt > dt_thresh):
            break
        changes = {}
        if dt > dt_thresh and raster_cfg.tile_cap < 8192:
            changes["tile_cap"] = raster_cfg.tile_cap * 2
        if dp and raster_cfg.bin_pairs_per_chunk < (1 << 18):
            changes["bin_pairs_per_chunk"] = \
                raster_cfg.bin_pairs_per_chunk * 2
        if not changes:
            break
        print(f"binner overflow at saved caps ({dp} pairs/{dt} tile): "
              f"growing {changes}")
        raster_cfg = _dc.replace(raster_cfg, **changes)

    if args.mesh:
        from types import SimpleNamespace

        from fourdgs_tpu.parallel.mesh import make_mesh
        from fourdgs_tpu.parallel.sharded import sharded_eval_render
        n_data, n_tile = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(n_data, n_tile)
        assert raster_cfg.num_tiles % n_tile == 0, \
            f"num_tiles {raster_cfg.num_tiles} not divisible by tile={n_tile}"
        pseudo_state = SimpleNamespace(params=params, alive=alive,
                                       aabb=jnp.asarray(aabb))
        print(f"rendering on mesh data={n_data} tile={n_tile}")

        def render_one(camera):
            color, _, _ = sharded_eval_render(
                pseudo_state, camera, bg, mesh=mesh, raster_cfg=raster_cfg,
                deform_cfg=deform_cfg, stage="fine",
                active_sh=cfg.model.sh_degree)
            return color
    else:
        @jax.jit
        def render_one(camera):
            return render_fn(params["gauss"], params["deform"], camera, bg,
                             raster_cfg, deform_cfg, jnp.asarray(aabb),
                             alive, cfg.model.sh_degree, stage="fine").color

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=8)

    def render_set(name, stacked, with_gt):
        out_dir = os.path.join(args.model_path, name,
                               f"ours_{it}", "renders")
        gt_dir = os.path.join(args.model_path, name, f"ours_{it}", "gt")
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        n = len(stacked)
        frames = []
        # warm up compile before timing (the reference's FPS protocol times
        # from the second view, ref render.py:57-70)
        _ = render_one(jax.tree.map(lambda a: a[0], stacked.cameras)
                       ).block_until_ready()
        t0 = time.time()
        for i in range(n):
            cam = jax.tree.map(lambda a: a[i], stacked.cameras)
            img = np.asarray(render_one(cam))
            frames.append(img)
        jax.block_until_ready(frames[-1] if frames else None)
        dt = time.time() - t0
        print(f"{name}: {n} views, FPS: {n / max(dt, 1e-9):.2f}")
        futs = []
        for i, img in enumerate(frames):
            futs.append(pool.submit(write_png,
                                    os.path.join(out_dir, f"{i:05d}.png"),
                                    img))
            if with_gt and stacked.images is not None:
                futs.append(pool.submit(
                    write_png, os.path.join(gt_dir, f"{i:05d}.png"),
                    np.asarray(stacked.images[i])))
        concurrent.futures.wait(futs)
        if name == "video":
            try:
                import imageio
                imageio.mimwrite(
                    os.path.join(args.model_path, name, f"ours_{it}",
                                 "video_rgb.mp4"),
                    [(np.clip(f, 0, 1) * 255).astype(np.uint8)
                     for f in frames], fps=30)
            except Exception as e:  # imageio/ffmpeg optional
                print(f"video writing skipped: {e}")

    if not args.skip_train:
        render_set("train", scene.train, True)
    if not args.skip_test:
        render_set("test", scene.test, True)
    if not args.skip_video:
        render_set("video", scene.video, False)


if __name__ == "__main__":
    main()
