#!/usr/bin/env python
"""Generate a synthetic animated dataset in Blender/D-NeRF format.

Renders an animated gaussian scene (bouncing colored blobs) with the tiled
rasterizer into transforms_{train,test}.json + PNGs, giving the framework a
self-contained trainable dynamic scene for end-to-end validation and
benchmarking when the real D-NeRF data is unavailable.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ball_scene(t: float, n_balls: int = 12, pts_per_ball: int = 300,
               seed: int = 3):
    """Gaussian blobs on sinusoidal paths at time t in [0,1]."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.9, 0.9, (n_balls, 3))
    vel = rng.uniform(-0.8, 0.8, (n_balls, 3))
    phase = rng.uniform(0, 2 * np.pi, n_balls)
    colors = rng.uniform(0.2, 1.0, (n_balls, 3))
    radius = rng.uniform(0.08, 0.18, n_balls)

    means, cols, scales = [], [], []
    for b in range(n_balls):
        c = centers[b] + vel[b] * np.sin(2 * np.pi * t + phase[b]) * 0.4
        offs = rng.normal(0, radius[b] * 0.5, (pts_per_ball, 3))
        means.append(c + offs)
        cols.append(np.tile(colors[b], (pts_per_ball, 1)))
        scales.append(np.full((pts_per_ball, 3), radius[b] * 0.25))
    means = np.concatenate(means).astype(np.float32)
    cols = np.concatenate(cols).astype(np.float32)
    scales = np.concatenate(scales).astype(np.float32)
    n = len(means)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full(n, 0.8, np.float32)
    return means, scales, quats, opac, cols


def lookat_c2w(theta: float, phi: float = -0.4, radius: float = 4.0):
    """OpenGL-style camera-to-world looking at the origin."""
    pos = radius * np.array([np.sin(theta) * np.cos(phi),
                             -np.sin(phi),
                             np.cos(theta) * np.cos(phi)])
    fwd = pos / np.linalg.norm(pos)           # OpenGL: -z is view dir
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = fwd
    c2w[:3, 3] = pos
    return c2w


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--size", type=int, default=400)
    parser.add_argument("--n_train", type=int, default=60)
    parser.add_argument("--n_test", type=int, default=10)
    parser.add_argument("--white_background", action="store_true",
                        default=True)
    parser.add_argument(
        "--protocol", choices=["monocular", "multiview"], default="monocular",
        help="monocular: one spiral view per timestamp (D-NeRF-like). "
        "multiview: a fixed rig of --n_cams cameras each seeing all "
        "--n_times timestamps; camera 0 is held out as the test split "
        "(DyNeRF-like holdout) — the honest novel-view generalization "
        "benchmark for the deformation field.")
    parser.add_argument("--n_cams", type=int, default=6)
    parser.add_argument("--n_times", type=int, default=30)
    parser.add_argument(
        "--holdout_every", type=int, default=0,
        help="monocular protocol only: draw train+test from ONE pose/time "
        "pool and hold out every Nth view as the test split (llffhold "
        "style) instead of a separate offset spiral — test views then come "
        "from the SAME distribution as train, the honest D-NeRF-style "
        "interpolation benchmark. 0 keeps the separate-spiral behavior.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fourdgs_tpu.data.camera import make_camera
    from fourdgs_tpu.data.scene_info import blender_matrix_to_rt
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize

    fovx = 0.8
    size = args.size
    cfg = RasterConfig(img_width=size, img_height=size, tile_size=16,
                       tile_cap=512, chunk=32, backend="auto")
    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)

    @jax.jit
    def render_frame(means, scales, quats, opac, cols, camera):
        return rasterize(means, scales, quats, opac, cols, camera, bg,
                         cfg).color

    def write_split(name, n_views, seed_offset):
        frames = []
        os.makedirs(os.path.join(args.out_dir, name), exist_ok=True)
        for i in range(n_views):
            t = i / max(n_views - 1, 1)
            theta = 2 * np.pi * (i * 7 % n_views) / n_views + seed_offset
            c2w = lookat_c2w(theta)
            R, T = blender_matrix_to_rt(c2w)
            camera = make_camera(R, T, fovx, fovx, time=t)
            m, s, q, o, c = (jnp.asarray(x) for x in ball_scene(t))
            img = np.asarray(render_frame(m, s, q, o, c, camera))
            rgba = np.concatenate(
                [np.clip(img, 0, 1),
                 np.ones((size, size, 1), np.float32)], -1)
            path = f"./{name}/r_{i}"
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                os.path.join(args.out_dir, f"{name}/r_{i}.png"))
            frames.append({"file_path": path, "time": t,
                           "transform_matrix": c2w.tolist()})
            if (i + 1) % 10 == 0:
                print(f"{name}: {i+1}/{n_views}", flush=True)
        with open(os.path.join(args.out_dir,
                               f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    def write_rig_split(name, cam_ids, n_times):
        """Multiview rig: fixed cameras, every camera sees every time."""
        frames = []
        os.makedirs(os.path.join(args.out_dir, name), exist_ok=True)
        n_cams = args.n_cams
        for ci in cam_ids:
            theta = 2 * np.pi * ci / n_cams
            phi = -0.55 + 0.3 * (ci % 3) / 2.0   # stagger elevations
            c2w = lookat_c2w(theta, phi=phi)
            R, T = blender_matrix_to_rt(c2w)
            for ti in range(n_times):
                t = ti / max(n_times - 1, 1)
                camera = make_camera(R, T, fovx, fovx, time=t)
                m, s, q, o, c = (jnp.asarray(x) for x in ball_scene(t))
                img = np.asarray(render_frame(m, s, q, o, c, camera))
                rgba = np.concatenate(
                    [np.clip(img, 0, 1),
                     np.ones((size, size, 1), np.float32)], -1)
                fname = f"cam{ci:02d}_t{ti:04d}"
                Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                    os.path.join(args.out_dir, f"{name}/{fname}.png"))
                frames.append({"file_path": f"./{name}/{fname}", "time": t,
                               "transform_matrix": c2w.tolist()})
            print(f"{name}: cam {ci} done ({n_times} frames)", flush=True)
        with open(os.path.join(args.out_dir,
                               f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.protocol == "multiview":
        # camera 0 is the held-out test view (DyNeRF protocol,
        # ref scene/neural_3D_dataset_NDC.py eval-cam holdout)
        write_rig_split("train", list(range(1, args.n_cams)), args.n_times)
        write_rig_split("test", [0], args.n_times)
    elif args.holdout_every:
        write_split("pool", args.n_train + args.n_test, 0.0)
        # split the pool json into train/test by interleaved holdout;
        # images stay under pool/ (file_path entries point there)
        with open(os.path.join(args.out_dir, "transforms_pool.json")) as f:
            pool = json.load(f)
        k = args.holdout_every
        tr = [fr for i, fr in enumerate(pool["frames"]) if i % k != 0]
        te = [fr for i, fr in enumerate(pool["frames"]) if i % k == 0]
        for name, frames in (("train", tr), ("test", te)):
            with open(os.path.join(args.out_dir,
                                   f"transforms_{name}.json"), "w") as f:
                json.dump({"camera_angle_x": pool["camera_angle_x"],
                           "frames": frames}, f)
        os.remove(os.path.join(args.out_dir, "transforms_pool.json"))
        print(f"holdout split: {len(tr)} train / {len(te)} test")
    else:
        write_split("train", args.n_train, 0.0)
        write_split("test", args.n_test, 0.13)
    print(f"synthetic dynamic scene written to {args.out_dir}")


if __name__ == "__main__":
    main()
