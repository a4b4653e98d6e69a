"""Training state: one pytree holding everything a train step touches.

The reference spreads this across GaussianModel attributes + torch optimizer
internals (ref scene/gaussian_model.py:47-106); here it is a single
functional pytree so the whole step jits and shards.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.models.deformation import DeformConfig, init_deform
from fourdgs_tpu.models.gaussians import GaussianParams, create_from_points
from fourdgs_tpu.models.hexplane import HexPlaneConfig
from fourdgs_tpu.train import optim
from fourdgs_tpu.train.config import Config


class TrainState(NamedTuple):
    params: dict                 # {'gauss': GaussianParams, 'deform': {...}}
    opt_state: Any
    alive: jnp.ndarray           # (cap,) bool
    aabb: jnp.ndarray            # (2, 3) rows (max, min) — deformation bounds
    xyz_gradient_accum: jnp.ndarray  # (cap,)
    denom: jnp.ndarray           # (cap,)
    max_radii2d: jnp.ndarray     # (cap,) float32
    step: jnp.ndarray            # () int32 within current stage

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    def n_alive(self) -> jnp.ndarray:
        return self.alive.sum()


def deform_config_from(cfg: Config) -> DeformConfig:
    h = cfg.hidden
    kp = h.kplanes_config
    return DeformConfig(
        net_width=h.net_width,
        defor_depth=h.defor_depth,
        grid=HexPlaneConfig(
            resolution=tuple(kp["resolution"]),
            out_dim=kp["output_coordinate_dim"],
            multires=tuple(h.multires)),
        timenet_width=h.timenet_width,
        timenet_output=h.timenet_output,
        timebase_pe=h.timebase_pe,
        no_dx=h.no_dx, no_grid=h.no_grid, no_ds=h.no_ds, no_dr=h.no_dr,
        no_do=h.no_do, no_dshs=h.no_dshs, apply_rotation=h.apply_rotation,
        empty_voxel=h.empty_voxel, static_mlp=h.static_mlp,
        sh_coeffs=(cfg.model.sh_degree + 1) ** 2,
        dx_bound=h.deform_dx_bound, ds_bound=h.deform_ds_bound,
        dr_bound=h.deform_dr_bound,
    )


def create_state(
    key: jax.Array,
    cfg: Config,
    points: np.ndarray,
    colors: np.ndarray,
    spatial_lr_scale: float,
    aabb: np.ndarray | None = None,
    deform_params: dict | None = None,
    gauss: GaussianParams | None = None,
    alive: jnp.ndarray | None = None,
) -> TrainState:
    """Fresh state for a training stage. Like the reference, each stage
    rebuilds the optimizer (ref train.py:46 gaussians.training_setup per
    scene_reconstruction call), so moments/schedules restart."""
    cap = cfg.raster.capacity
    if gauss is None:
        gauss, alive = create_from_points(points, colors, cap,
                                          cfg.model.sh_degree)
    if deform_params is None:
        deform_params = init_deform(key, deform_config_from(cfg))
    params = {"gauss": gauss, "deform": deform_params}
    tx = optim.build_optimizer(cfg.opt, spatial_lr_scale, params)
    opt_state = tx.init(params)
    if aabb is None:
        b = cfg.hidden.bounds
        aabb = np.array([[b, b, b], [-b, -b, -b]], np.float32)
    return TrainState(
        params=params,
        opt_state=opt_state,
        alive=alive,
        aabb=jnp.asarray(aabb, jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,)),
        denom=jnp.zeros((cap,)),
        max_radii2d=jnp.zeros((cap,)),
        step=jnp.zeros([], jnp.int32),
    )
