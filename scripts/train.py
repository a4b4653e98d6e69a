#!/usr/bin/env python
"""Training CLI: two-stage 4DGS optimization.

Usage (mirrors ref train.py:392-429):
  python scripts/train.py -s data/dnerf/bouncingballs \
      --configs fourdgs_tpu/configs/dnerf/bouncingballs.py --expname dnerf/bb
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    # jax.distributed must be initialized before the backend comes up, so
    # peek at the flag before building the full parser (which imports jax
    # via the config module).
    if "--distributed" in sys.argv[1:]:
        from fourdgs_tpu.parallel.multihost import initialize_distributed
        initialize_distributed()

    parser = argparse.ArgumentParser(description="4DGS-TPU training")
    parser.add_argument("-s", "--source_path", required=True)
    parser.add_argument("-m", "--model_path", default="")
    parser.add_argument("--expname", default="default")
    parser.add_argument("--configs", default="")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[3000, 7000, 14000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[14000, 20000, 30000, 45000, 60000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=6666)
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the fine stage")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed for multi-host "
                        "(DCN) training; hosts shard the camera batch by "
                        "process index over the mesh's data axis")
    parser.add_argument("--mesh", default="",
                        help="multi-chip mesh 'data,tile' (e.g. '4,2'); "
                             "batch_size must be divisible by data")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="enable jax_debug_nans: abort with a traceback "
                        "at the first op producing NaN (the reference's "
                        "torch.autograd.set_detect_anomaly, ref "
                        "train.py:428); slower — debugging only")
    parser.add_argument("--gui", action="store_true",
                        help="serve the SIBR viewer protocol during training")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)

    from fourdgs_tpu.train import config as config_mod
    cfg = config_mod.Config()
    config_mod.add_args(parser, cfg)
    args = parser.parse_args()
    if args.configs:
        cfg = config_mod.apply_config_file(cfg, args.configs)
    cfg = config_mod.apply_args(cfg, args)
    cfg.model.source_path = os.path.abspath(args.source_path)
    cfg.model.model_path = args.model_path or os.path.join(
        "./output/", args.expname)
    cfg.expname = args.expname
    cfg.seed = args.seed

    os.makedirs(cfg.model.model_path, exist_ok=True)
    config_mod.save_cfg(cfg, os.path.join(cfg.model.model_path, "cfg_args.json"))

    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    from fourdgs_tpu.data.scene import Scene
    from fourdgs_tpu.ops import losses
    from fourdgs_tpu.train import checkpoint, loop, optim, state as state_mod
    from fourdgs_tpu.train.state import deform_config_from

    np.random.seed(cfg.seed)
    # Setup-phase timing: the pre-training phase (scene load + KNN init +
    # first device compiles) can dominate wall time on a cold
    # remote-compile tunnel (the r5c run spent ~20 min here with no log
    # output, indistinguishable from a hang) — stamp each stage.
    t_setup = time.time()
    print(f"Loading scene from {cfg.model.source_path}", flush=True)
    scene = Scene.load(cfg.model.source_path,
                       white_background=cfg.model.white_background,
                       eval_split=cfg.model.eval,
                       extension=cfg.model.extension,
                       images=cfg.model.images or None,
                       llffhold=cfg.model.llffhold,
                       downscale=max(cfg.model.resolution, 1))
    print(f"  type={scene.dataset_type} train={len(scene.train)} "
          f"test={len(scene.test)} extent={scene.cameras_extent:.3f} "
          f"({time.time() - t_setup:.1f}s)", flush=True)

    pcd = scene.info.point_cloud
    key = jax.random.key(cfg.seed)
    t0 = time.time()
    st = state_mod.create_state(
        key, cfg, pcd.points, pcd.colors,
        spatial_lr_scale=scene.cameras_extent, aabb=scene.aabb)
    st = loop.compact_and_resize(
        st, loop.pick_bucket(int(st.alive.sum()), cfg.raster.capacity))
    print(f"  state init (KNN + first device compile): "
          f"{time.time() - t0:.1f}s", flush=True)
    tx = optim.build_optimizer(cfg.opt, scene.cameras_extent, st.params)
    st = st._replace(opt_state=tx.init(st.params))

    raster_cfg = loop.raster_config_from(cfg, scene.train.width,
                                         scene.train.height)
    deform_cfg = deform_config_from(cfg)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    rng = np.random.default_rng(cfg.seed)
    metrics_log = open(os.path.join(cfg.model.model_path, "train_log.jsonl"),
                       "a")
    try:  # TensorBoard scalars when torch's writer is importable
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(cfg.model.model_path)
    except Exception:
        tb = None

    def log_fn(rec):
        print(f"[{rec['stage']} {rec['iter']}] loss={rec['loss']:.5f} "
              f"psnr={rec['psnr']:.2f} pts={rec['points']} "
              f"t={rec['elapsed']:.1f}s")
        metrics_log.write(json.dumps(rec) + "\n")
        metrics_log.flush()
        if tb is not None:
            s = rec["stage"]
            tb.add_scalar(f"{s}/train_loss_patches/l1_loss", rec["l1"],
                          rec["iter"])
            tb.add_scalar(f"{s}/train_loss_patchestotal_loss", rec["loss"],
                          rec["iter"])
            tb.add_scalar(f"{s}/total_points", rec["points"], rec["iter"])
            tb.add_scalar(f"{s}/psnr", rec["psnr"], rec["iter"])

    # live viewer bridge (ref network_gui polling at train.py:109-134)
    gui = None
    if args.gui:
        import functools

        from fourdgs_tpu.render.render import render as render_fn
        from fourdgs_tpu.viewer.network_gui import NetworkGui
        gui = NetworkGui()
        gui.init(args.ip, args.port)
        print(f"viewer bridge listening on {args.ip}:{args.port}")

        @functools.lru_cache(maxsize=4)
        def gui_raster_cfg(w, h):
            return loop.raster_config_from(cfg, w, h)

        def make_on_iteration(stage):
            def on_iteration(it, state, active_sh):
                n_video = max(len(scene.video), 1)
                t = float(scene.video.times[it % n_video])

                def gui_render(camera, w, h, scaling_modifier):
                    out = render_fn(
                        state.params["gauss"], state.params["deform"],
                        camera, bg, gui_raster_cfg(w, h), deform_cfg,
                        state.aabb, state.alive, active_sh, stage=stage,
                        scale_modifier=scaling_modifier)
                    return np.asarray(out.color)

                gui.poll(gui_render, cfg.model.source_path, time=t)
            return on_iteration
    else:
        def make_on_iteration(stage):
            return None

    if args.distributed:
        import jax
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices")

    mesh = None
    if args.mesh:
        from fourdgs_tpu.parallel.mesh import make_mesh
        n_data, n_tile = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(n_data, n_tile)
        print(f"training on mesh data={n_data} tile={n_tile}")

    # temporally-correlated sampling for multi-camera rigs
    # (ref FineSampler, utils/loader_utils.py:20-52)
    epoch_order_fn = None
    if cfg.opt.custom_sampler:
        from fourdgs_tpu.train.sampler import fine_sample_order
        times = scene.train.times
        frame_length = len(np.unique(times))
        n_poses = max(len(scene.train) // max(frame_length, 1), 1)

        def epoch_order_fn(r):
            return fine_sample_order(len(scene.train), n_poses, r)

    def eval_render(state, cam, stage, active_sh, rcfg=None):
        """Mesh-aware single-view render: tile-sharded over the mesh when
        one is active (sharded_eval_render), single-device otherwise.

        `rcfg` is the LIVE raster config (auto-growth may have raised the
        binner caps past the startup config — rendering with the stale
        caps silently drops pairs; observed 14-27 dB eval error on
        synth_mv). If the render still overflows on this view, double the
        overflowing cap and re-render (one cached compile per cfg)."""
        import dataclasses as _dc
        rcfg = rcfg or raster_cfg
        if mesh is not None and rcfg.num_tiles % mesh.shape["tile"] == 0:
            from fourdgs_tpu.parallel.sharded import sharded_eval_render
            color, depth, _ = sharded_eval_render(
                state, cam, bg, mesh=mesh, raster_cfg=rcfg,
                deform_cfg=deform_cfg, stage=stage,
                active_sh=int(active_sh))
            return color, depth
        for _ in range(4):
            out = loop.eval_step(state, cam, bg, stage=stage,
                                 active_sh=active_sh, raster_cfg=rcfg,
                                 deform_cfg=deform_cfg)
            dp, dt = int(out.dropped_pairs), int(out.dropped_tile)
            # dropped_tile materiality: >0.5% of the view's pairs (the
            # counter is an upper bound; see loop.py autogrow note)
            dt_thresh = max(64, int(out.num_pairs) // 200)
            if not (dp or dt > dt_thresh):
                break
            changes = {}
            if dt > dt_thresh:
                changes["tile_cap"] = min(rcfg.tile_cap * 2, 8192)
            if dp:
                changes["bin_pairs_per_chunk"] = min(
                    rcfg.bin_pairs_per_chunk * 2, 1 << 18)
            if not changes or all(
                    getattr(rcfg, k) == v for k, v in changes.items()):
                break
            rcfg = _dc.replace(rcfg, **changes)
        return out.color, out.depth

    def make_on_test(stage):
        def eval_split(split, name, it, state, active_sh, n=None,
                       save_triptych=False, rcfg=None):
            n = len(split) if n is None else min(len(split), n)
            psnrs = []
            for i in range(n):
                cam = jax.tree.map(lambda a: a[i], split.cameras)
                color, depth = eval_render(state, cam, stage, active_sh,
                                           rcfg)
                img = jnp.clip(color, 0, 1)
                psnrs.append(float(losses.psnr(img, split.images[i])[0]))
                if save_triptych and i == 0:
                    # gt/render/depth triptych debug images
                    # (ref utils/scene_utils.py:11-57 at train.py:247-254)
                    from fourdgs_tpu.utils.visualize import \
                        render_training_image
                    render_training_image(
                        os.path.join(cfg.model.model_path, "train_render",
                                     f"{stage}{name}"),
                        f"{stage}{name}", it, 0.0,
                        np.asarray(split.images[i]), np.asarray(img),
                        np.asarray(depth), float(split.times[i]))
            return psnrs

        def on_test(it, state, active_sh, raster_cfg=None):
            # full test split + a small train sample, per ref
            # train.py:343-376 (test = all cameras, train = 5-view probe)
            test_psnrs = eval_split(scene.test, "test", it, state,
                                    active_sh,
                                    save_triptych=cfg.model.render_process,
                                    rcfg=raster_cfg)
            train_psnrs = eval_split(scene.train, "train", it, state,
                                     active_sh, n=5, rcfg=raster_cfg)
            print(f"\n[ITER {it}] Evaluating test: PSNR "
                  f"{np.mean(test_psnrs):.2f} over {len(test_psnrs)} views "
                  f"(train probe {np.mean(train_psnrs):.2f})")
            metrics_log.write(json.dumps(
                {"stage": stage, "iter": it, "eval": "test",
                 "psnr": float(np.mean(test_psnrs)),
                 "psnr_per_view": [round(p, 4) for p in test_psnrs],
                 "train_probe_psnr": float(np.mean(train_psnrs))}) + "\n")
            metrics_log.flush()
            if tb is not None:
                tb.add_scalar(f"{stage}/test/loss_viewpoint - psnr",
                              float(np.mean(test_psnrs)), it)
                tb.add_scalar(f"{stage}/train/loss_viewpoint - psnr",
                              float(np.mean(train_psnrs)), it)
                # histograms of opacity + accumulated motion, per ref
                # train.py:378-383 (scene_opacity_histogram / deformation)
                gauss = state.params["gauss"]
                alive = np.asarray(state.alive)
                op = 1.0 / (1.0 + np.exp(-np.asarray(gauss.opacity[:, 0])))
                tb.add_histogram(f"{stage}/scene/opacity_histogram",
                                 op[alive], it)
                denom = np.maximum(np.asarray(state.denom), 1.0)
                motion = np.asarray(state.xyz_gradient_accum) / denom
                tb.add_histogram(f"{stage}/scene/motion_histogram",
                                 motion[alive], it)
        return on_test

    def make_on_save(stage):
        def on_save(it, state):
            path = checkpoint.save_snapshot(state, cfg.model.model_path, it,
                                            stage)
            print(f"\n[ITER {it}] Saved snapshot to {path}")
        return on_save

    def make_on_ckpt(stage):
        def on_ckpt(it, state, active_sh):
            path = os.path.join(cfg.model.model_path,
                                f"chkpnt_{stage}_{it}.npz")
            checkpoint.save_checkpoint(state, path, it, stage, active_sh)
            print(f"\n[ITER {it}] Saved checkpoint {path}")
        return on_ckpt

    total_time = 0.0
    stages = [("coarse", cfg.opt.coarse_iterations),
              ("fine", cfg.opt.iterations)]
    start_stage = 0
    if args.start_checkpoint:
        _, it0, stage0, _ = checkpoint.load_checkpoint(
            args.start_checkpoint, st)
        if stage0 == "fine":
            start_stage = 1
            print("start from fine stage, skip coarse stage.")

    active_sh = 0  # persists across stages (ref keeps active_sh_degree)
    for si, (stage, iters) in enumerate(stages):
        if si < start_stage:
            continue
        # fresh optimizer per stage (ref train.py:46)
        tx = optim.build_optimizer(cfg.opt, scene.cameras_extent, st.params)
        st = st._replace(opt_state=tx.init(st.params),
                         step=jnp.zeros([], jnp.int32))
        start_it = 0
        if args.start_checkpoint and si == start_stage:
            st, start_it, _, active_sh = checkpoint.load_checkpoint(
                args.start_checkpoint, st)
            print(f"resumed {stage} stage at iteration {start_it} "
                  f"(sh degree {active_sh})")
        zmask = (scene.zerostamp_mask()
                 if stage == "coarse" and cfg.opt.zerostamp_init else None)
        if args.profile and stage == "fine":
            jax.profiler.start_trace(
                os.path.join(cfg.model.model_path, "trace"))
        res = loop.run_stage(
            cfg, st, stage, iters, scene.train.cameras, scene.train.images,
            tx, raster_cfg, rng=rng, key=jax.random.key(cfg.seed + si),
            log_fn=log_fn, zerostamp_view_mask=zmask,
            cameras_extent=scene.cameras_extent,
            test_iterations=tuple(args.test_iterations),
            save_iterations=tuple(args.save_iterations) + (iters,),
            checkpoint_iterations=tuple(args.checkpoint_iterations),
            on_test=make_on_test(stage), on_save=make_on_save(stage),
            on_checkpoint=make_on_ckpt(stage),
            epoch_order_fn=None if stage == "coarse" else epoch_order_fn,
            mesh=mesh, on_iteration=make_on_iteration(stage),
            start_iteration=start_it, initial_active_sh=active_sh)
        if args.profile and stage == "fine":
            jax.profiler.stop_trace()
        st = res.state
        active_sh = res.active_sh
        if res.raster_cfg is not None:
            raster_cfg = res.raster_cfg   # carry cap auto-growth forward
        total_time += res.wall_time
        print(f"{stage} stage done in {res.wall_time:.1f}s "
              f"({int(st.alive.sum())} points)")

    print(f"\nTraining complete in {total_time:.1f}s (excl. eval/saving).")


if __name__ == "__main__":
    main()
