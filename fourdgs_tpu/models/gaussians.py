"""Gaussian point-set parameters on a fixed-capacity buffer.

The reference mutates tensor sizes on densify/prune with optimizer surgery
(ref scene/gaussian_model.py:316-456). Under XLA we keep shapes static: a
capacity-`cap` buffer plus an `alive` mask; densify/clone/split/prune are
masked scatters into free slots (train/densify.py). Raw (pre-activation)
parameterization matches the reference: log-scales, logit-opacity,
unnormalized quaternions, SH color coefficients.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops import knn, sh, transforms


class GaussianParams(NamedTuple):
    """Trainable per-point parameters; every leaf has leading dim `cap`."""
    xyz: jnp.ndarray            # (cap, 3)
    features_dc: jnp.ndarray    # (cap, 1, 3) SH DC band
    features_rest: jnp.ndarray  # (cap, K-1, 3) higher SH bands
    scaling: jnp.ndarray        # (cap, 3) log-scale
    rotation: jnp.ndarray       # (cap, 4) unnormalized wxyz
    opacity: jnp.ndarray        # (cap, 1) logit

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def features(self) -> jnp.ndarray:
        """(cap, K, 3) concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


def activated(params: GaussianParams):
    """Raw -> rendering quantities (ref gaussian_model.py:29-44)."""
    return dict(
        scales=transforms.safe_exp_scales(params.scaling),
        quats=transforms.quat_normalize(params.rotation),
        opacities=jax.nn.sigmoid(params.opacity[:, 0]),
    )


def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    cap: int,
    max_sh_degree: int = 3,
) -> tuple[GaussianParams, jnp.ndarray]:
    """Initialize from a colored point cloud (ref create_from_pcd,
    scene/gaussian_model.py:137-164): SH DC from RGB, log-scale from sqrt of
    mean 3-NN squared distance, identity rotations, opacity 0.1.

    Returns (params, alive) with `alive` marking the first n slots.
    """
    n = points.shape[0]
    if n > cap:
        raise ValueError(f"point cloud ({n}) exceeds capacity ({cap})")
    k = (max_sh_degree + 1) ** 2

    pts = jnp.zeros((cap, 3)).at[:n].set(jnp.asarray(points, jnp.float32))
    dc = jnp.zeros((cap, 1, 3)).at[:n, 0].set(
        sh.rgb_to_sh(jnp.asarray(colors, jnp.float32)))
    rest = jnp.zeros((cap, k - 1, 3))

    d2 = knn.dist2_init(np.asarray(points, np.float32))
    log_scale = jnp.log(jnp.sqrt(d2))
    scaling = jnp.zeros((cap, 3)).at[:n].set(log_scale[:, None])

    rotation = jnp.zeros((cap, 4)).at[:, 0].set(1.0)
    opacity = jnp.full((cap, 1), transforms.inverse_sigmoid(jnp.float32(0.1)))

    alive = jnp.zeros((cap,), bool).at[:n].set(True)
    params = GaussianParams(xyz=pts, features_dc=dc, features_rest=rest,
                            scaling=scaling, rotation=rotation,
                            opacity=opacity)
    return params, alive
