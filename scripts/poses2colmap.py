#!/usr/bin/env python
"""Convert known poses (Blender/NeRF transforms.json or LLFF
poses_bounds.npy) into a COLMAP text sparse model for the triangulation
pipeline (the python equivalent of ref scripts/{blender,llff,
hypernerf}2colmap.py): cameras.txt + images.txt + empty points3D.txt,
ready for `colmap point_triangulator`."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_sparse_text(out_dir, cameras, images):
    """cameras: {id: (model, w, h, params)}; images: [(id, qvec, tvec,
    cam_id, name)]."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        for cid, (model, w, h, params) in cameras.items():
            f.write(f"{cid} {model} {w} {h} "
                    + " ".join(str(p) for p in params) + "\n")
    with open(os.path.join(out_dir, "images.txt"), "w") as f:
        f.write("# Image list\n")
        for iid, qvec, tvec, cam_id, name in images:
            f.write(f"{iid} " + " ".join(f"{v:.10f}" for v in qvec) + " "
                    + " ".join(f"{v:.10f}" for v in tvec)
                    + f" {cam_id} {name}\n\n")
    open(os.path.join(out_dir, "points3D.txt"), "w").close()


def from_blender(path: str, out_dir: str, width=800, height=800):
    from fourdgs_tpu.data.colmap import rotmat2qvec
    from fourdgs_tpu.data.scene_info import blender_matrix_to_rt
    from fourdgs_tpu.ops.transforms import fov2focal

    with open(path) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    focal = fov2focal(fovx, width)
    cameras = {1: ("SIMPLE_PINHOLE", width, height,
                   [focal, width / 2, height / 2])}
    images = []
    for i, frame in enumerate(contents["frames"]):
        R, T = blender_matrix_to_rt(frame["transform_matrix"])
        # COLMAP stores world->cam: R_w2c = R.T, t = T
        qvec = rotmat2qvec(R.T)
        name = os.path.basename(frame["file_path"]) + ".png"
        images.append((i + 1, qvec, T, 1, name))
    write_sparse_text(out_dir, cameras, images)
    print(f"wrote {len(images)} poses to {out_dir}")


def from_llff(path: str, out_dir: str, image_names=None):
    from fourdgs_tpu.data.colmap import rotmat2qvec
    from fourdgs_tpu.data.llff_poses import c2w_to_rt, load_poses_bounds

    poses, near_fars, hwf = load_poses_bounds(path)
    h, w, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    cameras = {1: ("SIMPLE_PINHOLE", w, h, [focal, w / 2, h / 2])}
    images = []
    for i, pose in enumerate(poses):
        R, T = c2w_to_rt(pose)
        qvec = rotmat2qvec(R.T)
        name = (image_names[i] if image_names
                else f"cam{i:02d}/frame_00001.jpg")
        images.append((i + 1, qvec, T, 1, name))
    write_sparse_text(out_dir, cameras, images)
    print(f"wrote {len(images)} poses to {out_dir}")


def from_hypernerf(root_dir: str, max_images: int = 200,
                   copy_images: bool = True):
    """HyperNeRF capture -> COLMAP text sparse model (the python
    equivalent of ref scripts/hypernerf2colmap.py).

    Reads the per-image Nerfies camera JSONs under `camera/` and the 2x
    downsampled frames under `rgb/2x/`, subsamples to at most
    `max_images` (the ref picks every `sizes`-th frame until <= 200
    remain, hypernerf2colmap.py:47-52), writes `sparse_/` with one
    SIMPLE_PINHOLE camera per image (focal/principal point halved for the
    2x images) and copies the selected frames to `image_colmap/` for
    `colmap point_triangulator`. The reference writes camera ids 0..n-1
    but references camera 1 from every image row (its :60-64); here each
    image references its OWN camera id, which is what COLMAP expects for
    per-image intrinsics."""
    import shutil

    from fourdgs_tpu.data.colmap import rotmat2qvec

    image_dir = os.path.join(root_dir, "rgb", "2x")
    names = sorted(os.listdir(image_dir))
    cam_files = sorted(os.listdir(os.path.join(root_dir, "camera")))
    cams = []
    for jf in cam_files:
        with open(os.path.join(root_dir, "camera", jf)) as f:
            cams.append(json.load(f))
    step = 2
    while len(cams) // step > max_images:
        step += 1
    out_dir = os.path.join(root_dir, "sparse_")
    img_out = os.path.join(root_dir, "image_colmap")
    if copy_images:
        os.makedirs(img_out, exist_ok=True)
    cameras = {}
    images = []
    idx = 0
    for cnt, (cam, name) in enumerate(zip(cams, names), 1):
        if cnt % step != 0:
            continue
        # Nerfies stores orientation as world->camera rows and position in
        # world space (ref scene/utils.py:129-160); COLMAP wants the
        # world->cam quaternion and t = -R_w2c @ position
        r_w2c = np.array(cam["orientation"])
        tvec = -r_w2c @ np.array(cam["position"])
        qvec = rotmat2qvec(r_w2c)
        w, h = (int(v) for v in cam["image_size"])
        cameras[idx + 1] = ("SIMPLE_PINHOLE", w // 2, h // 2,
                            [cam["focal_length"] / 2,
                             cam["principal_point"][0] / 2,
                             cam["principal_point"][1] / 2])
        images.append((idx + 1, qvec, tvec, idx + 1, name))
        if copy_images:
            shutil.copy(os.path.join(image_dir, name),
                        os.path.join(img_out, name))
        idx += 1
    write_sparse_text(out_dir, cameras, images)
    print(f"wrote {idx} poses to {out_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="transforms json, poses_bounds.npy, "
                        "or a HyperNeRF capture dir (camera/ + rgb/2x)")
    parser.add_argument("out_dir", nargs="?", default=None,
                        help="output sparse dir (unused for hypernerf: "
                        "writes <input>/sparse_ like the reference)")
    parser.add_argument("--width", type=int, default=800)
    parser.add_argument("--height", type=int, default=800)
    args = parser.parse_args()
    if os.path.isdir(args.input):
        from_hypernerf(args.input)
    elif args.input.endswith(".npy"):
        from_llff(args.input, args.out_dir)
    else:
        from_blender(args.input, args.out_dir, args.width, args.height)


if __name__ == "__main__":
    main()
