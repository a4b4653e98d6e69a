"""Scene facade: dataset-type sniffing, loading, device staging.

Mirrors ref scene/__init__.py:23-109: dispatch on marker files
(sparse/ -> Colmap, transforms_train.json -> Blender, poses_bounds.npy ->
dynerf, dataset.json -> nerfies, train_meta.json -> PanopticSports,
points3D_multipleview.ply -> MultipleView), then exposes train/test/video
cameras, the init point cloud, the camera extent (spatial LR scale) and the
deformation AABB from the point-cloud bounds.

TPU staging: small datasets are stacked into device-resident arrays (one
Camera pytree + one image tensor) so the train loop only gathers indices —
no host->device copies per step.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data.camera import Camera, make_camera
from fourdgs_tpu.data.scene_info import CameraInfo, SceneInfo


def detect_scene_type(path: str) -> str:
    if os.path.exists(os.path.join(path, "sparse")):
        return "Colmap"
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return "Blender"
    if os.path.exists(os.path.join(path, "poses_bounds.npy")):
        return "dynerf"
    if os.path.exists(os.path.join(path, "dataset.json")):
        return "nerfies"
    if os.path.exists(os.path.join(path, "train_meta.json")):
        return "PanopticSports"
    if os.path.exists(os.path.join(path, "points3D_multipleview.ply")):
        return "MultipleView"
    raise ValueError(f"could not recognize scene type for {path}")


def load_scene_info(path: str, *, white_background: bool = True,
                    eval_split: bool = True, extension: str = ".png",
                    images: str | None = None, llffhold: int = 8,
                    load_images: bool = True,
                    resolution=None) -> tuple[SceneInfo, str]:
    kind = detect_scene_type(path)
    if kind == "Blender":
        from fourdgs_tpu.data.blender import RESOLUTION, read_blender_scene
        info = read_blender_scene(path, white_background, eval_split,
                                  extension,
                                  resolution=resolution or RESOLUTION)
    elif kind == "Colmap":
        from fourdgs_tpu.data.colmap_scene import read_colmap_scene
        info = read_colmap_scene(path, images, eval_split, llffhold,
                                 load_images)
    elif kind == "dynerf":
        from fourdgs_tpu.data.dynerf import read_dynerf_scene
        info = read_dynerf_scene(path, load_images=load_images)
    elif kind == "nerfies":
        from fourdgs_tpu.data.hyper import read_hyper_scene
        info = read_hyper_scene(path, load_images=load_images)
    elif kind == "PanopticSports":
        from fourdgs_tpu.data.panoptic import read_panoptic_scene
        info = read_panoptic_scene(path, load_images=load_images)
    elif kind == "MultipleView":
        from fourdgs_tpu.data.multiview import read_multipleview_scene
        info = read_multipleview_scene(path, load_images=load_images)
    else:  # pragma: no cover
        raise AssertionError(kind)
    return info, kind


def camera_from_info(info: CameraInfo) -> Camera:
    if isinstance(info, dict):  # PanopticSports style
        return info["camera"]
    return make_camera(info.R, info.T, info.fovx, info.fovy, time=info.time)


def _load_image(info, downscale: int = 1) -> np.ndarray:
    from PIL import Image

    if isinstance(info, dict):
        img = info["image"]
        if img is None:
            raise ValueError("panoptic camera without image")
    elif info.image is not None:
        img = info.image
    else:
        img = np.asarray(Image.open(info.image_path).convert("RGB"),
                         np.float32) / 255.0
    if downscale > 1:
        h, w = img.shape[:2]
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        pil = pil.resize((w // downscale, h // downscale), Image.LANCZOS)
        img = np.asarray(pil, np.float32) / 255.0
    return img


@dataclass
class StackedCameras:
    """Device-resident camera + image bank for one split."""
    cameras: Camera            # batched pytree, leading dim = n views
    images: jnp.ndarray | None  # (n, H, W, 3) or None for pose-only splits
    times: np.ndarray
    width: int
    height: int

    def __len__(self):
        return int(np.asarray(self.times).shape[0])


def stack_cameras(infos: list, with_images: bool = True,
                  downscale: int = 1) -> StackedCameras:
    """Uniform downscaling keeps FoVs valid (focal scales with pixels)."""
    cams = [camera_from_info(i) for i in infos]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    images = None
    if with_images:
        images = jnp.asarray(np.stack([_load_image(i, downscale)
                                       for i in infos]))
    first = infos[0]
    if isinstance(first, dict):
        w, h = first["width"], first["height"]
    else:
        w, h = first.width, first.height
    if downscale > 1:
        w, h = w // downscale, h // downscale
    times = np.array([i["time"] if isinstance(i, dict) else i.time
                      for i in infos], np.float32)
    return StackedCameras(cameras=stacked, images=images, times=times,
                          width=int(w), height=int(h))


@dataclass
class Scene:
    """Loaded scene ready for training (the reference's Scene facade)."""
    info: SceneInfo
    dataset_type: str
    train: StackedCameras
    test: StackedCameras
    video: StackedCameras
    cameras_extent: float
    aabb: np.ndarray          # (2, 3) rows (max, min) for the deform field
    maxtime: float

    @classmethod
    def load(cls, path: str, downscale: int = 1, **kwargs) -> "Scene":
        """`downscale` divides image resolution (the reference's -r flag,
        ref ModelParams.resolution)."""
        info, kind = load_scene_info(path, **kwargs)
        train = stack_cameras(info.train_cameras, with_images=True,
                              downscale=downscale)
        test = (stack_cameras(info.test_cameras, with_images=True,
                              downscale=downscale)
                if info.test_cameras else train)
        video = (stack_cameras(info.video_cameras, with_images=False,
                               downscale=downscale)
                 if info.video_cameras else test)
        pts = info.point_cloud.points
        aabb = np.stack([pts.max(0), pts.min(0)]).astype(np.float32)
        return cls(info=info, dataset_type=kind, train=train, test=test,
                   video=video,
                   cameras_extent=float(info.nerf_normalization["radius"]),
                   aabb=aabb, maxtime=info.maxtime)

    def zerostamp_mask(self) -> np.ndarray:
        """Views at the first timestamp (ref get_stamp_list for
        zerostamp_init, utils/loader_utils.py:13, train.py:99-105)."""
        t = self.train.times
        return t == t.min()
