"""Device mesh construction for multi-chip training.

The reference has no distributed backend at all (SURVEY.md §2/§5.8 — its
"multi-GPU" is shell-level per-scene job fan-out). The TPU-native scaling
design is greenfield: a 2D mesh with axes
  * "data": cameras in the batch (data parallel; grads psum over ICI/DCN)
  * "tile": image tiles within a camera (the rasterizer's pixel work and
    the gaussian-gradient scatter are sharded; partial per-gaussian grads
    psum over "tile")
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_tile: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_tile
    assert n_data * n_tile <= len(devices), (
        f"need {n_data}x{n_tile} devices, have {len(devices)}")
    dev = np.array(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev, axis_names=("data", "tile"))


def factor_devices(n: int) -> tuple[int, int]:
    """Split n devices into (data, tile): prefer a square-ish split with
    tile a power of two, falling back to pure data-parallel."""
    best = (n, 1)
    t = 1
    while t * t <= n:
        if n % t == 0:
            best = (n // t, t)
        t *= 2
    return best
