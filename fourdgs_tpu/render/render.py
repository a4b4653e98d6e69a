"""High-level render(): deformation -> activation -> SH -> rasterize.

Mirrors the reference renderer's dataflow (ref gaussian_renderer/
__init__.py:18-138): raw params are deformed in the "fine" stage at the
camera's timestamp, then activated (exp / normalize / sigmoid), colors come
from SH evaluated toward the camera, and everything goes through the tiled
rasterizer. Fully differentiable; a zero `ndc_offset` input is the
screen-space gradient carrier used for densification stats (the reference's
`screenspace_points`, gaussian_renderer/__init__.py:26-30).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.models.deformation import DeformConfig, deform_apply
from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.ops import sh as sh_ops
from fourdgs_tpu.ops import transforms
from fourdgs_tpu.ops.rasterize_ref import RenderOutput
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize


def render(
    gauss: GaussianParams,
    deform_params,
    camera: Camera,
    bg: jnp.ndarray,
    raster_cfg: RasterConfig,
    deform_cfg: DeformConfig,
    aabb: jnp.ndarray,
    alive: jnp.ndarray,
    active_sh_degree: int,
    stage: str = "fine",
    ndc_offset: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
) -> RenderOutput:
    shs = gauss.features()
    if stage == "coarse":
        xyz, scaling, rotation, opacity, shs_f = (
            gauss.xyz, gauss.scaling, gauss.rotation, gauss.opacity, shs)
    elif stage == "fine":
        xyz, scaling, rotation, opacity, shs_f = deform_apply(
            deform_params, deform_cfg, aabb, gauss.xyz, gauss.scaling,
            gauss.rotation, gauss.opacity, shs, camera.time)
    else:
        raise NotImplementedError(stage)

    scales = transforms.safe_exp_scales(scaling)
    quats = transforms.quat_normalize(rotation)
    opacities = jax.nn.sigmoid(opacity[:, 0])

    if override_color is None:
        dirs = xyz - camera.cam_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        if isinstance(active_sh_degree, int):
            colors = sh_ops.sh_to_rgb(active_sh_degree, shs_f, dirs)
        else:
            # dynamic (traced) degree: masked full-degree eval, so the SH
            # ramp never triggers a recompile
            import math
            max_deg = int(math.isqrt(shs_f.shape[1])) - 1
            colors = sh_ops.sh_to_rgb_dynamic(active_sh_degree, shs_f, dirs,
                                              max_deg)
    else:
        colors = override_color

    return rasterize(xyz, scales, quats, opacities, colors, camera, bg,
                     raster_cfg, ndc_offset=ndc_offset, alive=alive,
                     scale_modifier=scale_modifier)
