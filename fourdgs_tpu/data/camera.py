"""Camera representation.

The reference's Camera is an nn.Module holding matrices + the gt image
(ref scene/cameras.py:17-64). Here the device-side part is a small pytree of
arrays (stackable/vmappable/shardable), and image width/height live in a
static CameraMeta so shapes stay static under jit.

Matrix convention: column vectors, p_view = world_view @ [p, 1];
p_clip = full_proj @ [p, 1] with w_clip = z_view.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops import transforms


class Camera(NamedTuple):
    """Per-view device data. All float32 arrays; batchable on a leading axis."""
    world_view: jnp.ndarray   # (4, 4) world -> view
    full_proj: jnp.ndarray    # (4, 4) world -> clip
    cam_center: jnp.ndarray   # (3,)
    tanfovx: jnp.ndarray      # ()
    tanfovy: jnp.ndarray      # ()
    time: jnp.ndarray         # () in [0, 1]


@dataclasses.dataclass(frozen=True)
class CameraMeta:
    """Static (hashable) per-dataset camera info, closed over by jit."""
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                time: float = 0.0, znear: float = 0.01, zfar: float = 100.0,
                trans=None, scale: float = 1.0) -> Camera:
    """Build a Camera from the reference's (R, T) convention: R = cam-to-world
    rotation, T = world-to-cam translation (ref scene/cameras.py:59-64)."""
    W = transforms.world_to_view(R, T, translate=trans, scale=scale)
    P = transforms.projection_matrix(znear, zfar, fovx, fovy)
    full = P @ W
    C2W = np.linalg.inv(W)
    center = C2W[:3, 3]
    return Camera(
        world_view=jnp.asarray(W, jnp.float32),
        full_proj=jnp.asarray(full, jnp.float32),
        cam_center=jnp.asarray(center, jnp.float32),
        tanfovx=jnp.float32(np.tan(fovx * 0.5)),
        tanfovy=jnp.float32(np.tan(fovy * 0.5)),
        time=jnp.float32(time),
    )
