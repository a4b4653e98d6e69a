"""PanopticSports (Dynamic3DGS-style) dataset reader.

Contract from ref readPanopticSportsinfos + readPanopticmeta + setup_camera
(scene/dataset_readers.py:484-594): {train,test}_meta.json with per-timestep
per-camera 3x3 intrinsics K, w2c matrices and image filenames under ims/;
init point cloud from init_pt_cld.npz. Cameras have off-center principal
points, so the projection matrix is built directly from K (ref
setup_camera's opengl_proj, scene/dataset_readers.py:490-494) rather than
from symmetric FoVs.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from fourdgs_tpu.data import ply
from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.data.scene_info import PointCloud, SceneInfo


def camera_from_k_w2c(k, w2c, w: int, h: int, near: float = 0.01,
                      far: float = 100.0, time: float = 0.0) -> Camera:
    """Build a Camera from a 3x3 K and a 4x4 w2c (column-vector convention),
    supporting off-center principal points (ref setup_camera,
    scene/dataset_readers.py:484-509)."""
    k = np.asarray(k, np.float64)
    w2c = np.asarray(w2c, np.float64)
    fx, fy, cx, cy = k[0][0], k[1][1], k[0][2], k[1][2]
    proj = np.array([
        [2 * fx / w, 0.0, -(w - 2 * cx) / w, 0.0],
        [0.0, 2 * fy / h, -(h - 2 * cy) / h, 0.0],
        [0.0, 0.0, far / (far - near), -(far * near) / (far - near)],
        [0.0, 0.0, 1.0, 0.0]])
    full = proj @ w2c
    center = np.linalg.inv(w2c)[:3, 3]
    return Camera(
        world_view=jnp.asarray(w2c, jnp.float32),
        full_proj=jnp.asarray(full, jnp.float32),
        cam_center=jnp.asarray(center, jnp.float32),
        tanfovx=jnp.float32(w / (2 * fx)),
        tanfovy=jnp.float32(h / (2 * fy)),
        time=jnp.float32(time),
    )


class PanopticCameraInfo(dict):
    """Panoptic cameras carry a ready-made Camera instead of (R, T) + fovs
    (mirroring the reference's dict-style cam entries,
    ref scene/dataset_readers.py:557-560)."""


def read_panoptic_meta(datadir: str, json_path: str,
                       load_images: bool = True):
    with open(os.path.join(datadir, json_path)) as f:
        meta = json.load(f)
    w, h = meta["w"], meta["h"]
    max_time = len(meta["fn"])
    cam_infos = []
    for index in range(len(meta["fn"])):
        time = index / len(meta["fn"])
        for k, w2c, fn in zip(meta["k"][index], meta["w2c"][index],
                              meta["fn"][index]):
            image = None
            if load_images:
                p = os.path.join(datadir, "ims", fn)
                image = np.asarray(Image.open(p).convert("RGB"),
                                   np.float32) / 255.0
            cam_infos.append(PanopticCameraInfo(
                camera=camera_from_k_w2c(k, w2c, w, h, time=time),
                time=time, image=image, width=w, height=h,
                image_name=fn))
    centers = np.linalg.inv(np.asarray(meta["w2c"][0]))[:, :3, 3]
    radius = 1.1 * np.max(
        np.linalg.norm(centers - centers.mean(0)[None], axis=-1))
    return cam_infos, max_time, radius


def read_panoptic_scene(datadir: str, load_images: bool = False) -> SceneInfo:
    train, max_time, radius = read_panoptic_meta(datadir, "train_meta.json",
                                                 load_images)
    test, _, _ = read_panoptic_meta(datadir, "test_meta.json", load_images)
    norm = {"radius": radius, "translate": np.zeros(3)}
    data = np.load(os.path.join(datadir, "init_pt_cld.npz"))["data"]
    xyz, rgb = data[:, :3], data[:, 3:6]
    pcd = PointCloud(points=xyz.astype(np.float32),
                     colors=rgb.astype(np.float32),
                     normals=np.ones((len(xyz), 3), np.float32))
    ply_path = os.path.join(datadir, "pointd3D.ply")
    ply.store_point_cloud(ply_path, xyz, rgb)
    return SceneInfo(point_cloud=pcd, train_cameras=train, test_cameras=test,
                     video_cameras=test, nerf_normalization=norm,
                     ply_path=ply_path, maxtime=max_time)
