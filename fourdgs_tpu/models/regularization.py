"""HexPlane grid regularizers: plane smoothness, time smoothness, L1-to-one.

Live-path contract from ref scene/gaussian_model.py:538-577 (NOT the unused
Regularizer classes in scene/regulation.py): second-difference smoothness
along each plane's second coordinate axis, applied to spatial planes {0,1,3}
for "plane" regulation and time planes {2,4,5} for "time" regulation, plus
mean |1 - grid| on time planes.

Our planes are stored (H, W, C) where H is the reference's dim-2 (the axis
`compute_plane_smoothness` differences over, ref scene/regulation.py:22-29).
"""
from __future__ import annotations

import jax.numpy as jnp

from fourdgs_tpu.models.hexplane import SPACE_PLANES, TIME_PLANES


def plane_smoothness(plane: jnp.ndarray) -> jnp.ndarray:
    """Mean squared second difference along axis 0 (the H axis)."""
    first = plane[1:] - plane[:-1]
    second = first[1:] - first[:-1]
    return jnp.square(second).mean()


def _sum_over(grids: dict, plane_ids) -> jnp.ndarray:
    total = 0.0
    for name, g in grids.items():
        ci = int(name.split("_p")[1])
        if ci in plane_ids:
            total = total + plane_smoothness(g)
    return total


def plane_regulation(grids: dict) -> jnp.ndarray:
    return _sum_over(grids, SPACE_PLANES)


def time_regulation(grids: dict) -> jnp.ndarray:
    return _sum_over(grids, TIME_PLANES)


def l1_time_regulation(grids: dict) -> jnp.ndarray:
    total = 0.0
    for name, g in grids.items():
        ci = int(name.split("_p")[1])
        if ci in TIME_PLANES:
            total = total + jnp.abs(1.0 - g).mean()
    return total


def compute_regulation(grids: dict, time_smoothness_weight: float,
                       l1_time_planes_weight: float,
                       plane_tv_weight: float) -> jnp.ndarray:
    """ref scene/gaussian_model.py:576-577."""
    return (plane_tv_weight * plane_regulation(grids)
            + time_smoothness_weight * time_regulation(grids)
            + l1_time_planes_weight * l1_time_regulation(grids))
