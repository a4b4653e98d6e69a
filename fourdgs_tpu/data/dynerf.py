"""DyNeRF / Neu3D (Plenoptic Video) dataset reader.

Contract from ref readdynerfInfo + Neural3D_NDC_Dataset
(scene/dataset_readers.py:441-482, scene/neural_3D_dataset_NDC.py:210-377):
poses_bounds.npy LLFF poses, per-camera cam*.mp4 videos extracted to 300
frames each (lazy, cached to cam*/images/), camera 0 held out for eval,
spiral validation path of 300 poses, init cloud points3D_downsample2.ply.
"""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from fourdgs_tpu.data import ply
from fourdgs_tpu.data.llff_poses import (c2w_to_rt, get_spiral,
                                         load_poses_bounds)
from fourdgs_tpu.data.scene_info import (CameraInfo, PointCloud, SceneInfo,
                                         nerfpp_norm)
from fourdgs_tpu.ops.transforms import focal2fov

IMG_WH = (1352, 1014)
N_FRAMES = 300


def extract_video_frames(video_path: str, img_wh=IMG_WH,
                         n_frames: int = N_FRAMES) -> str:
    """Decode a video to cached PNG frames (ref
    neural_3D_dataset_NDC.py:320-340). Returns the images directory."""
    image_dir = os.path.join(video_path.split(".")[0], "images")
    if os.path.exists(image_dir):
        return image_dir
    import cv2
    os.makedirs(image_dir)
    cap = cv2.VideoCapture(video_path)
    count = 0
    while cap.isOpened() and count < n_frames:
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        img = Image.fromarray(frame).resize(img_wh, Image.LANCZOS)
        img.save(os.path.join(image_dir, "%04d.png" % count))
        count += 1
    cap.release()
    return image_dir


def _camera_infos(datadir: str, split: str, poses_all: np.ndarray,
                  focal: float, img_wh, eval_index: int,
                  load_images: bool) -> list[CameraInfo]:
    videos = sorted(glob.glob(os.path.join(datadir, "cam*.mp4")))
    infos = []
    uid = 0
    w, h = img_wh
    fovx = focal2fov(focal, w)
    fovy = focal2fov(focal, h)
    for index, video_path in enumerate(videos):
        if (index == eval_index) == (split == "train"):
            continue
        image_dir = extract_video_frames(video_path, img_wh)
        frames = sorted(os.listdir(image_dir))[:N_FRAMES]
        R, T = c2w_to_rt(poses_all[index])
        for idx, name in enumerate(frames):
            p = os.path.join(image_dir, name)
            image = None
            if load_images:
                image = np.asarray(Image.open(p).resize(img_wh, Image.LANCZOS),
                                   np.float32)[..., :3] / 255.0
            infos.append(CameraInfo(
                uid=uid, R=R, T=T, fovx=fovx, fovy=fovy, image=image,
                image_path=p, image_name=name, width=w, height=h,
                time=idx / N_FRAMES))
            uid += 1
    return infos


def read_dynerf_scene(datadir: str, eval_index: int = 0, img_wh=IMG_WH,
                      load_images: bool = False) -> SceneInfo:
    poses, near_fars, hwf = load_poses_bounds(
        os.path.join(datadir, "poses_bounds.npy"))
    downsample = 2704 / img_wh[0]
    focal = hwf[2] / downsample

    train = _camera_infos(datadir, "train", poses, focal, img_wh, eval_index,
                          load_images)
    test = _camera_infos(datadir, "test", poses, focal, img_wh, eval_index,
                         load_images)

    # spiral video path over 300 poses (ref neural_3D_dataset_NDC.py:287)
    val_poses = get_spiral(poses, near_fars, N_views=300)
    w, h = img_wh
    video = []
    for idx, p in enumerate(val_poses):
        pose = np.eye(4)
        pose[:3, :] = p[:3, :]
        R, T = c2w_to_rt(pose)
        video.append(CameraInfo(
            uid=idx, R=R, T=T, fovx=focal2fov(focal, w),
            fovy=focal2fov(focal, h), image=None, image_path=None,
            image_name=f"{idx}", width=w, height=h,
            time=idx / len(val_poses)))

    norm = nerfpp_norm(train) if train else {"translate": np.zeros(3),
                                             "radius": 1.0}
    ply_path = os.path.join(datadir, "points3D_downsample2.ply")
    pts, cols, normals = ply.fetch_point_cloud(ply_path)
    pcd = PointCloud(points=pts, colors=cols, normals=normals)
    return SceneInfo(point_cloud=pcd, train_cameras=train, test_cameras=test,
                     video_cameras=video, nerf_normalization=norm,
                     ply_path=ply_path, maxtime=300)
