#!/usr/bin/env python
"""Controlled fine-stage stability experiment on data/synth_mv.

Phase 1 (--coarse): train coarse 3000 once, checkpoint to
outputs/stab/coarse.npz.
Phase 2 (--fine NAME): restore the coarse checkpoint, run fine N iters,
dump the history (loss/psnr/visible/grid_absmax every 50) to
outputs/stab/fine_NAME.json. Toggle variants via env:
  BENCH_BACKEND=xla        XLA blend instead of Pallas
(The generic time-plane sampler can be forced via
 HexPlaneConfig.const_t=False in the config.)

Purpose: the first full synth_mv run died at fine-2800 (visibility
collapse after a hexplane magnitude runaway); this isolates whether any
round-2 kernel path changes the divergence trajectory.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "outputs/stab"


def setup():
    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    from fourdgs_tpu.data.scene import Scene
    from fourdgs_tpu.train import config as config_mod, loop, optim, \
        state as state_mod
    from fourdgs_tpu.train.state import deform_config_from

    cfg = config_mod.Config()
    cfg = config_mod.apply_config_file(
        cfg, "fourdgs_tpu/configs/dnerf/bouncingballs.py")
    cfg.model.white_background = True
    cfg.model.eval = True
    cfg.raster.backend = os.environ.get("BENCH_BACKEND", "auto")
    scene = Scene.load("data/synth_mv", white_background=True,
                       eval_split=True)
    pcd = scene.info.point_cloud
    key = jax.random.key(6666)
    st = state_mod.create_state(key, cfg, pcd.points, pcd.colors,
                                spatial_lr_scale=scene.cameras_extent,
                                aabb=scene.aabb)
    st = loop.compact_and_resize(
        st, loop.pick_bucket(int(st.alive.sum()), cfg.raster.capacity))
    tx = optim.build_optimizer(cfg.opt, scene.cameras_extent, st.params)
    st = st._replace(opt_state=tx.init(st.params))
    raster_cfg = loop.raster_config_from(cfg, scene.train.width,
                                         scene.train.height)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    return cfg, scene, st, tx, raster_cfg, bg, loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse", action="store_true")
    ap.add_argument("--fine", default=None, help="variant name")
    ap.add_argument("--iters", type=int, default=4000)
    args = ap.parse_args()

    import jax
    from fourdgs_tpu.train import checkpoint

    cfg, scene, st, tx, raster_cfg, bg, loop = setup()
    os.makedirs(OUT, exist_ok=True)
    ck = os.path.join(OUT, "coarse.npz")

    if args.coarse:
        res = loop.run_stage(
            cfg, st, "coarse", cfg.opt.coarse_iterations,
            scene.train.cameras, scene.train.images, tx, raster_cfg,
            rng=np.random.default_rng(6666), key=jax.random.key(1),
            log_every=200, cameras_extent=scene.cameras_extent,
            log_fn=lambda r: print(r, flush=True))
        checkpoint.save_checkpoint(res.state, ck, cfg.opt.coarse_iterations,
                                   "coarse", res.active_sh)
        print("saved", ck)
        return

    st2, it0, stage, sh = checkpoint.load_checkpoint(ck, st)
    print(f"restored {ck} at {stage} {it0} active_sh={sh}", flush=True)
    hist = []
    res = loop.run_stage(
        cfg, st2, "fine", args.iters, scene.train.cameras,
        scene.train.images, tx, raster_cfg,
        rng=np.random.default_rng(6666), key=jax.random.key(2),
        log_every=50, cameras_extent=scene.cameras_extent,
        initial_active_sh=sh,
        log_fn=lambda r: (hist.append(r), print(
            f"[{r['iter']}] loss {r['loss']:.4f} psnr {r['psnr']:.2f} "
            f"vis {r['visible']} grid {r['grid_absmax']:.2f} "
            f"pts {r['points']}", flush=True)))
    with open(os.path.join(OUT, f"fine_{args.fine}.json"), "w") as f:
        json.dump(hist, f)
    print("done", args.fine)


if __name__ == "__main__":
    main()
