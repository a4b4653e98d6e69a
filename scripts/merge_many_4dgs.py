#!/usr/bin/env python
"""Compose several trained 4DGS models into one rendered video with
per-model rigid transforms — the scene-editing demo
(ref merge_many_4dgs.py:37-141). Each model is deformed at the frame's
timestamp, transformed, concatenated, and rasterized together."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rotate_points(xyz: np.ndarray, rx=0.0, ry=0.0, rz=0.0) -> np.ndarray:
    """Euler XYZ rotation of a point cloud (ref merge_many_4dgs.py:37-57)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return xyz @ (Rz @ Ry @ Rx).T


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_paths", nargs="+", required=True)
    parser.add_argument("-s", "--source_path", required=True,
                        help="scene providing the camera path")
    parser.add_argument("--offsets", nargs="+", default=[],
                        help="per-model 'dx,dy,dz' translations")
    parser.add_argument("--scales", nargs="+", type=float, default=[])
    parser.add_argument("--out", default="merged")
    parser.add_argument("--n_frames", type=int, default=60)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fourdgs_tpu.data.scene import Scene
    from fourdgs_tpu.models.deformation import init_deform
    from fourdgs_tpu.ops import transforms
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize
    from fourdgs_tpu.ops import sh as sh_ops
    from fourdgs_tpu.render.state_at_time import get_state_at_time
    from fourdgs_tpu.train import checkpoint, config as config_mod
    from fourdgs_tpu.train.state import deform_config_from

    models = []
    for i, mp in enumerate(args.model_paths):
        cfg = config_mod.load_cfg(os.path.join(mp, "cfg_args.json"))
        snap, _ = checkpoint.find_latest_snapshot(mp)
        gauss, alive, dflat, aabb = \
            checkpoint.restore_gaussians_from_snapshot(
                snap, cap=1, max_sh_degree=cfg.model.sh_degree)
        dcfg = deform_config_from(cfg)
        dparams = checkpoint.deform_params_from_flat(
            init_deform(jax.random.key(0), dcfg), dflat)
        offset = np.zeros(3)
        if i < len(args.offsets):
            offset = np.array([float(x) for x in args.offsets[i].split(",")])
        scale = args.scales[i] if i < len(args.scales) else 1.0
        models.append((gauss, alive, dparams, dcfg, jnp.asarray(aabb),
                       offset, scale))

    scene = Scene.load(args.source_path, load_images=False)
    cams = scene.video
    rcfg = RasterConfig(img_width=scene.video.width,
                        img_height=scene.video.height)
    bg = jnp.zeros(3)
    out_dir = os.path.join(args.out)
    os.makedirs(out_dir, exist_ok=True)

    from PIL import Image
    frames = []
    n = min(args.n_frames, len(cams))
    for fi in range(n):
        cam = jax.tree.map(lambda a: a[fi], cams.cameras)
        t = float(cams.times[fi])
        parts = {"xyz": [], "scales": [], "quats": [], "op": [], "col": []}
        for gauss, alive, dparams, dcfg, aabb, offset, scale in models:
            xyz, scaling, rotation, opacity, shs = get_state_at_time(
                gauss, dparams, dcfg, aabb, t)
            m = np.asarray(alive)
            xyz = np.asarray(xyz)[m] * scale + offset
            dirs = xyz - np.asarray(cam.cam_center)
            dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True),
                               1e-8)
            col = sh_ops.sh_to_rgb(3, jnp.asarray(np.asarray(shs)[m]),
                                   jnp.asarray(dirs))
            parts["xyz"].append(xyz)
            parts["scales"].append(np.exp(np.asarray(scaling)[m]) * scale)
            parts["quats"].append(np.asarray(rotation)[m])
            parts["op"].append(
                np.asarray(jax.nn.sigmoid(jnp.asarray(opacity)))[m][:, 0])
            parts["col"].append(np.asarray(col))
        out = rasterize(
            jnp.asarray(np.concatenate(parts["xyz"])),
            jnp.asarray(np.concatenate(parts["scales"])),
            jnp.asarray(np.concatenate(parts["quats"])),
            jnp.asarray(np.concatenate(parts["op"])),
            jnp.asarray(np.concatenate(parts["col"])),
            cam, bg, rcfg)
        img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, f"{fi:05d}.png"))
        frames.append(img)
        print(f"frame {fi+1}/{n}")
    try:
        import imageio
        imageio.mimwrite(os.path.join(out_dir, "merged.mp4"), frames, fps=30)
    except Exception as e:
        print(f"mp4 skipped: {e}")


if __name__ == "__main__":
    main()
