#!/usr/bin/env python
"""Bake deformed Gaussians at each test timestamp into standard static-3DGS
PLY files (ref export_perframe_3DGS.py:1-106) so any 3DGS viewer can play
the sequence frame by frame."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("-s", "--source_path", default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--n_frames", type=int, default=0,
                        help="override: bake N uniform timestamps instead "
                             "of the test split's")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.data import ply
    from fourdgs_tpu.data.scene import Scene
    from fourdgs_tpu.models.deformation import init_deform
    from fourdgs_tpu.render.state_at_time import get_state_at_time
    from fourdgs_tpu.train import checkpoint, config as config_mod
    from fourdgs_tpu.train.state import deform_config_from

    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    cfg = config_mod.load_cfg(cfg_path) if os.path.exists(cfg_path) \
        else config_mod.Config()

    snap_dir, it = checkpoint.find_latest_snapshot(args.model_path,
                                                   args.iteration)
    gauss, alive, deform_flat, aabb = \
        checkpoint.restore_gaussians_from_snapshot(
            snap_dir, cap=1, max_sh_degree=cfg.model.sh_degree)
    deform_cfg = deform_config_from(cfg)
    template = init_deform(jax.random.key(0), deform_cfg)
    deform_params = checkpoint.deform_params_from_flat(template, deform_flat)

    if args.n_frames:
        times = np.linspace(0, 1, args.n_frames)
    else:
        source = args.source_path or cfg.model.source_path
        scene = Scene.load(source,
                           white_background=cfg.model.white_background,
                           eval_split=cfg.model.eval, load_images=False)
        times = np.unique(scene.test.times)

    out_root = os.path.join(args.model_path, "gaussian_pertimestamp")
    os.makedirs(out_root, exist_ok=True)
    baked = jax.jit(lambda t: get_state_at_time(
        gauss, deform_params, deform_cfg, jnp.asarray(aabb), t))
    mask = np.asarray(alive)
    for i, t in enumerate(times):
        xyz, scaling, rotation, opacity, shs = jax.tree.map(
            np.asarray, baked(float(t)))
        ply.save_gaussians(
            os.path.join(out_root, f"time_{i:05d}.ply"),
            xyz[mask], shs[mask][:, :1], shs[mask][:, 1:],
            opacity[mask], scaling[mask], rotation[mask])
        print(f"baked t={t:.4f} -> time_{i:05d}.ply ({mask.sum()} pts)")


if __name__ == "__main__":
    main()
