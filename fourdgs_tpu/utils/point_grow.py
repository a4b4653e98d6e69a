"""Density-based point-cloud growing (the `--add_point` path).

Behavioral contract from ref utils/point_utils.py:39-130 (addpoint +
GaussianModel.grow at ref train.py:280-281): find low-density points (mean
KNN distance above a quantile), displace them outward along the local
density gradient, and add perturbed copies. The reference uses sklearn
NearestNeighbors; here it is the same chunked-matmul KNN as init (TPU
MXU-friendly, no sklearn)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fourdgs_tpu.ops.knn import knn_mean_sq_dist


def low_density_points(xyz: jnp.ndarray, k: int = 8,
                       quantile: float = 0.8):
    """Mask of points whose mean k-NN squared distance exceeds the
    quantile (sparse regions — growth candidates)."""
    d2 = knn_mean_sq_dist(xyz, k=k)
    thresh = jnp.quantile(d2, quantile)
    return d2 > thresh, d2


def grow_points(key: jax.Array, xyz: jnp.ndarray, displacement_scale: float,
                k: int = 8, quantile: float = 0.8):
    """Returns (candidate_mask, new_xyz): perturbed copies of sparse-region
    points (caller scatters them into free gaussian slots with the same
    appearance params, like densify-clone)."""
    mask, d2 = low_density_points(xyz, k, quantile)
    sigma = jnp.sqrt(jnp.maximum(d2, 1e-12))[:, None] * displacement_scale
    noise = jax.random.normal(key, xyz.shape) * sigma
    return mask, xyz + noise
