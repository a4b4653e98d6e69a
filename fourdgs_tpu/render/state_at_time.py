"""Deformed Gaussian state at a timestamp (ref utils/render_utils.py:1-18:
get_state_at_time) — used by per-frame export and the multi-model
compositor."""
from __future__ import annotations

import jax.numpy as jnp

from fourdgs_tpu.models.deformation import DeformConfig, deform_apply
from fourdgs_tpu.models.gaussians import GaussianParams


def get_state_at_time(gauss: GaussianParams, deform_params,
                      deform_cfg: DeformConfig, aabb, time: float):
    """Returns deformed RAW params (xyz, scaling, rotation, opacity, shs)
    at `time`, full buffer (caller applies the alive mask)."""
    shs = gauss.features()
    return deform_apply(deform_params, deform_cfg, aabb, gauss.xyz,
                        gauss.scaling, gauss.rotation, gauss.opacity, shs,
                        jnp.float32(time))
