"""Dense trilinear voxel grid (the reference's DenseGrid, used by the
`empty_voxel` masking flag; ref scene/grid.py:15-55). Pure jnp trilinear
gather+lerp over a (X, Y, Z, C) grid with border clamp."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_dense_grid(world_size=(64, 64, 64), channels: int = 1):
    return jnp.zeros(tuple(world_size) + (channels,))


def dense_grid_sample(grid: jnp.ndarray, pts_norm: jnp.ndarray) -> jnp.ndarray:
    """Sample (X, Y, Z, C) grid at (N, 3) coords in [-1, 1]
    (align_corners, border clamp). Returns (N, C)."""
    gx, gy, gz, _ = grid.shape

    def axis_coords(v, size):
        x = jnp.clip((v + 1.0) * 0.5 * (size - 1), 0.0, size - 1)
        x0 = jnp.floor(x).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, size - 1)
        return x0, x1, (x - x0)[:, None]

    x0, x1, fx = axis_coords(pts_norm[:, 0], gx)
    y0, y1, fy = axis_coords(pts_norm[:, 1], gy)
    z0, z1, fz = axis_coords(pts_norm[:, 2], gz)

    def g(i, j, k):
        return grid[i, j, k]

    c00 = g(x0, y0, z0) * (1 - fx) + g(x1, y0, z0) * fx
    c01 = g(x0, y0, z1) * (1 - fx) + g(x1, y0, z1) * fx
    c10 = g(x0, y1, z0) * (1 - fx) + g(x1, y1, z0) * fx
    c11 = g(x0, y1, z1) * (1 - fx) + g(x1, y1, z1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz
