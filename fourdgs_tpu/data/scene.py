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
import threading
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


class ImageBank:
    """Image storage for one split with a device/host/lazy residency ladder.

    The reference streams frames from disk through DataLoader workers (ref
    scene/dataset.py:19-43 + train.py:89-94); on TPU the equivalent is:

      * "device": the whole split lives in HBM as one f32 array — per-step
        cost is a device-side gather (small splits, e.g. D-NeRF);
      * "host": the split lives in host RAM as uint8; each batch is
        converted + device_put per step (JAX dispatch is async, so the
        transfer overlaps the previous step's compute);
      * "lazy": only file paths are kept; batches are decoded on demand
        with a small LRU — DyNeRF-scale splits (100s of GB decoded) train
        without ever materializing the split anywhere.

    Duck-types the array surface the train loop uses: `bank[idxs]` returns
    a device-resident (B, H, W, 3) f32 batch, `.shape[0]`/len() give the
    view count.

    `prefetch(idxs)` overlaps the next batch's decode + host->device upload
    with the current step's device compute on a single worker thread (the
    TPU analogue of the reference's DataLoader workers, ref train.py:89-94;
    one thread two batches deep is enough since decode < step time).
    """

    def __init__(self, mode: str, *, device_images=None, host_images=None,
                 infos=None, downscale: int = 1, n: int = 0,
                 height: int = 0, width: int = 0, cache_size: int = 64):
        self.mode = mode
        self._device = device_images
        self._host = host_images
        self._infos = infos
        self._downscale = downscale
        self._n = n
        self._hw = (height, width)
        self._cache: dict[int, np.ndarray] = {}
        self._cache_size = cache_size
        self._lock = threading.Lock()
        self._pool = None
        self._pending: dict[tuple, Any] = {}

    @property
    def shape(self):
        if self.mode == "device":
            return self._device.shape
        if self.mode == "host":
            return self._host.shape
        return (self._n, self._hw[0], self._hw[1], 3)

    def __len__(self):
        return int(self.shape[0])

    def _load_lazy(self, i: int) -> np.ndarray:
        with self._lock:
            if i in self._cache:
                return self._cache[i]
        img = np.rint(_load_image(self._infos[i], self._downscale)
                      * 255.0).astype(np.uint8)
        with self._lock:
            if len(self._cache) >= self._cache_size:
                self._cache.pop(next(iter(self._cache)))
            self._cache[i] = img
        return img

    def _materialize(self, idxs: np.ndarray):
        if self.mode == "host":
            batch = self._host[idxs]
        else:
            batch = np.stack([self._load_lazy(int(i)) for i in idxs])
        # jnp dispatch is async: the upload + u8->f32 convert run on device
        # while the caller's previous step is still executing
        return jnp.asarray(batch, jnp.float32) / 255.0

    def prefetch(self, idxs):
        """Schedule decode + device upload of a future batch on the worker
        thread; a later `bank[same idxs]` returns the staged array."""
        if self.mode == "device":
            return
        key = tuple(int(i) for i in np.ravel(idxs))
        with self._lock:
            if key in self._pending:
                return
            if self._pool is None:
                import concurrent.futures
                self._pool = concurrent.futures.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="imagebank")
            # bound staleness: a batch order reshuffle (e.g. the NaN-guard
            # rollback resamples the epoch) can orphan scheduled batches
            while len(self._pending) >= 4:
                self._pending.pop(next(iter(self._pending)))
            self._pending[key] = self._pool.submit(
                self._materialize, np.asarray(idxs))

    def __getitem__(self, idxs):
        if self.mode == "device":
            return self._device[idxs]
        if np.ndim(idxs) == 0:
            return self[np.asarray([idxs])][0]
        idxs = np.asarray(idxs)
        with self._lock:
            fut = self._pending.pop(tuple(int(i) for i in idxs.ravel()),
                                    None)
        if fut is not None:
            return fut.result()
        return self._materialize(idxs)


# staging budget: splits bigger than this (decoded f32) stay off-device
DEVICE_IMAGE_BUDGET = 4 << 30
# splits bigger than this (uint8) are not even host-materialized
HOST_IMAGE_BUDGET = 16 << 30


@dataclass
class StackedCameras:
    """Camera pytree (device) + image bank for one split."""
    cameras: Camera            # batched pytree, leading dim = n views
    images: "ImageBank | jnp.ndarray | None"
    times: np.ndarray
    width: int
    height: int

    def __len__(self):
        return int(np.asarray(self.times).shape[0])


def _info_dims(info, downscale):
    if isinstance(info, dict):
        w, h = info["width"], info["height"]
    else:
        w, h = info.width, info.height
    if downscale > 1:
        w, h = w // downscale, h // downscale
    return int(w), int(h)


def stack_cameras(infos: list, with_images: bool = True,
                  downscale: int = 1,
                  device_budget: int = DEVICE_IMAGE_BUDGET,
                  host_budget: int = HOST_IMAGE_BUDGET) -> StackedCameras:
    """Uniform downscaling keeps FoVs valid (focal scales with pixels).
    Image residency (device/host/lazy) is chosen from the decoded split
    size against the budgets — see ImageBank."""
    cams = [camera_from_info(i) for i in infos]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    first = infos[0]
    w, h = _info_dims(first, downscale)
    times = np.array([i["time"] if isinstance(i, dict) else i.time
                      for i in infos], np.float32)
    images = None
    if with_images:
        n = len(infos)
        f32_bytes = n * h * w * 3 * 4
        u8_bytes = n * h * w * 3
        can_lazy = all(
            (isinstance(i, dict) and i.get("image") is not None)
            or (not isinstance(i, dict) and (i.image is not None
                                             or i.image_path)) for i in infos)
        if f32_bytes <= device_budget:
            images = ImageBank(
                "device",
                device_images=jnp.asarray(np.stack(
                    [_load_image(i, downscale) for i in infos])))
        elif u8_bytes <= host_budget or not can_lazy:
            images = ImageBank("host", host_images=np.stack(
                [np.rint(_load_image(i, downscale) * 255.0).astype(np.uint8)
                 for i in infos]))
        else:
            images = ImageBank("lazy", infos=infos, downscale=downscale,
                               n=n, height=h, width=w)
    return StackedCameras(cameras=stacked, images=images, times=times,
                          width=w, height=h)


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
