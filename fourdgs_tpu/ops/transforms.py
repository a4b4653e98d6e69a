"""Geometry substrate: quaternions, covariance build, camera matrices.

TPU-native reimplementation of the math used by the reference 4DGaussians
(see /root/reference/utils/graphics_utils.py and utils/general_utils.py for
the behavioral contract; conventions match 3DGS so PLY/poses interoperate).

All functions are pure jnp, batched over leading axes, jit/vmap-safe.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z convention, matching 3DGS)
# ---------------------------------------------------------------------------

SCALE_LOG_MAX = 15.0  # exp(15) ~ 3.3e6: far beyond any useful world scale


def safe_exp_scales(scaling: jnp.ndarray) -> jnp.ndarray:
    """exp with an overflow clamp for scale activation.

    A raw log-scale that drifts past ~88 makes exp() inf, which poisons the
    whole model: the inf covariance gets the gaussian culled, the culled
    branch back-propagates 0 * inf = NaN into scaling, and Adam moments keep
    the NaN forever (observed: a fully-NaN model renders pure background and
    the photometric loss stays finite, so a loss-only NaN guard never
    fires). The clamp keeps the primal finite; healthy training never gets
    within 10 of the bound."""
    return jnp.exp(jnp.minimum(scaling, SCALE_LOG_MAX))


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotation matrices.

    Normalizes internally (behavioral parity with the reference's
    `build_rotation`, utils/general_utils.py:84).
    """
    q = quat_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Batched Hamilton product, normalized (ref utils/graphics_utils.py:109)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return quat_normalize(jnp.stack([w, x, y, z], axis=-1))


# ---------------------------------------------------------------------------
# Covariance build
# ---------------------------------------------------------------------------

def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3) scales + (..., 4) quats -> (..., 3, 3)."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def build_covariance_3d(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Sigma = L L^T with L = R diag(m*s). Returns full (..., 3, 3)."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return L @ jnp.swapaxes(L, -1, -2)


def build_covariance_packed(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T, directly as the packed 6-vector
    [xx, xy, xz, yy, yz, zz].

    Elementwise over the batch: Sigma[i,k] = sum_j R[i,j] R[k,j] s[j]^2.
    Equivalent to strip_symmetric(build_covariance_3d(...)) but avoids
    materializing (N, 3, 3) arrays and batched 3x3 matmuls, which XLA pads
    to MXU tiles at ~1000x waste (measured 5.2 ms -> ~0.3 ms at N=131k on
    v5e inside the projection fwd)."""
    q = quat_normalize(rotation)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scaling_modifier * scaling
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    return jnp.stack([
        r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2,
        r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2,
        r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2,
        r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2,
        r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2,
        r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2], axis=-1)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) upper-triangular packed
    [xx, xy, xz, yy, yz, zz] (ref utils/general_utils.py:70-82)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1)], axis=-2)


# ---------------------------------------------------------------------------
# Camera matrices (numpy: built once per camera on host, never in jit)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray = None, scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4. `R` is the camera-to-world rotation and `t` the
    world-to-camera translation, matching the (R, T) convention the reference
    stores on its Camera objects (ref utils/graphics_utils.py:38-49).

    Returns W such that p_view = W @ [p_world, 1] (column-vector convention;
    the reference keeps the transpose for torch row-vector multiplies).
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection (ref utils/graphics_utils.py:51-71).

    Maps view space to clip space; w_clip = z_view. Column-vector convention:
    p_clip = P @ p_view.
    """
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return np.float32(P)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))
