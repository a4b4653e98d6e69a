"""COLMAP (static / monocular) scene reader.

Contract from ref readColmapSceneInfo + readColmapCameras
(scene/dataset_readers.py:79-199): sparse/0 binary-or-text reconstruction,
per-image time = idx/N (monocular video assumption), llffhold test split,
points3D converted to PLY on first load.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from fourdgs_tpu.data import colmap, ply
from fourdgs_tpu.data.scene_info import (CameraInfo, PointCloud, SceneInfo,
                                         nerfpp_norm)
from fourdgs_tpu.ops.transforms import focal2fov


def read_colmap_cameras(cam_extrinsics, cam_intrinsics, images_folder,
                        load_images: bool = True) -> list[CameraInfo]:
    infos = []
    n = len(cam_extrinsics)
    for idx, key in enumerate(cam_extrinsics):
        extr = cam_extrinsics[key]
        intr = cam_intrinsics[extr.camera_id]
        R = np.transpose(colmap.qvec2rotmat(extr.qvec))
        T = np.array(extr.tvec)
        if intr.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
            fovy = focal2fov(intr.params[0], intr.height)
            fovx = focal2fov(intr.params[0], intr.width)
        elif intr.model in ("PINHOLE", "OPENCV"):
            fovx = focal2fov(intr.params[0], intr.width)
            fovy = focal2fov(intr.params[1], intr.height)
        else:
            raise ValueError(
                f"unsupported COLMAP camera model {intr.model}: only "
                "undistorted (SIMPLE_)PINHOLE/OPENCV datasets supported")
        image_path = os.path.join(images_folder, os.path.basename(extr.name))
        image = None
        if load_images:
            image = np.asarray(Image.open(image_path).convert("RGB"),
                               np.float32) / 255.0
        infos.append(CameraInfo(
            uid=intr.id, R=R, T=T, fovx=fovx, fovy=fovy, image=image,
            image_path=image_path,
            image_name=os.path.basename(image_path).split(".")[0],
            width=intr.width, height=intr.height, time=float(idx / n)))
    return infos


def load_sparse(path: str, sub: str = "sparse/0"):
    try:
        extr = colmap.read_images_binary(os.path.join(path, sub, "images.bin"))
        intr = colmap.read_cameras_binary(os.path.join(path, sub, "cameras.bin"))
    except (FileNotFoundError, OSError):
        extr = colmap.read_images_text(os.path.join(path, sub, "images.txt"))
        intr = colmap.read_cameras_text(os.path.join(path, sub, "cameras.txt"))
    return extr, intr


def ensure_points_ply(path: str, sub: str = "sparse/0",
                      name: str = "points3D") -> str:
    ply_path = os.path.join(path, sub, f"{name}.ply")
    if not os.path.exists(ply_path):
        bin_path = os.path.join(path, sub, f"{name}.bin")
        txt_path = os.path.join(path, sub, f"{name}.txt")
        try:
            xyz, rgb, _ = colmap.read_points3d_binary(bin_path)
        except (FileNotFoundError, OSError):
            xyz, rgb, _ = colmap.read_points3d_text(txt_path)
        ply.store_point_cloud(ply_path, xyz, rgb)
    return ply_path


def read_colmap_scene(path: str, images: str | None, eval_split: bool,
                      llffhold: int = 8,
                      load_images: bool = True) -> SceneInfo:
    extr, intr = load_sparse(path)
    reading_dir = "images" if images is None else images
    infos = read_colmap_cameras(extr, intr, os.path.join(path, reading_dir),
                                load_images)
    infos = sorted(infos, key=lambda c: c.image_name)
    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []
    norm = nerfpp_norm(train)
    ply_path = ensure_points_ply(path)
    pts, cols, normals = ply.fetch_point_cloud(ply_path)
    pcd = PointCloud(points=pts, colors=cols, normals=normals)
    return SceneInfo(point_cloud=pcd, train_cameras=train, test_cameras=test,
                     video_cameras=train, nerf_normalization=norm,
                     ply_path=ply_path, maxtime=0)
