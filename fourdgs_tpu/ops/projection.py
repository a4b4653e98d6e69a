"""Gaussian projection: 3D -> screen-space splats (EWA).

The vectorized equivalent of the per-Gaussian `preprocess` stage of the
reference's CUDA rasterizer (behavioral contract via its call site,
ref gaussian_renderer/__init__.py:38-51,120-128): view transform, frustum
cull at z<=0.2, perspective projection, 2D covariance by local affine (EWA)
with the +0.3 pixel low-pass, conic + 3-sigma radius, and tile rects.

Everything is plain jnp over the N axis — XLA fuses this into a handful of
VPU passes; the matmul-shaped parts (cov2d) are written as elementwise math
on packed covariances to avoid tiny-batched 3x3 matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.ops import transforms

FRUSTUM_NEAR = 0.2     # view-space z cull threshold
LOWPASS = 0.3          # pixel-space covariance dilation
RADIUS_SIGMA = 3.0
# Blending gate constants (single source; rasterize_ref re-exports them).
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (all (N, ...))."""
    pix: jnp.ndarray            # (N, 2) pixel-space center
    depth: jnp.ndarray          # (N,) view-space z
    conic: jnp.ndarray          # (N, 3) inverse 2D covariance (A, B, C)
    radius: jnp.ndarray         # (N,) int32 screen radius (0 = culled)
    rect_min: jnp.ndarray       # (N, 2) int32 inclusive tile min (x, y)
    rect_max: jnp.ndarray       # (N, 2) int32 exclusive tile max (x, y)
    tiles_touched: jnp.ndarray  # (N,) int32
    cull_r2: jnp.ndarray | None = None  # (N,) int32 squared pixel radius
    #   beyond which alpha < ALPHA_MIN is GUARANTEED (gate bound
    #   q * lam1); sentinel 2^30 = never cull. See binner corner cull.


def project_gaussians(
    means3d: jnp.ndarray,          # (N, 3)
    scales: jnp.ndarray,           # (N, 3) activated (positive)
    quats: jnp.ndarray,            # (N, 4) (normalized internally)
    camera: Camera,
    img_width: int,
    img_height: int,
    tile_size: int,
    ndc_offset: jnp.ndarray | None = None,   # (N, 2) zero grad-carrier
    alive: jnp.ndarray | None = None,        # (N,) bool
    scale_modifier: float = 1.0,
    cov3d_precomp: jnp.ndarray | None = None,  # (N, 6) packed, optional
    opacities: jnp.ndarray | None = None,    # (N,) activated, optional
) -> Projected:
    n = means3d.shape[0]
    W = camera.world_view

    # --- view transform + frustum cull ---
    t = means3d @ W[:3, :3].T + W[:3, 3]
    tz = t[:, 2]
    in_front = tz > FRUSTUM_NEAR
    # Culled gaussians get a SAFE depth for all division-bearing math. A
    # point within float-epsilon of the camera plane (tz ~ 0) otherwise
    # yields inf/NaN in the primal (e.g. 0 * inf in the EWA Jacobian), and
    # even with zero cotangents the VJP turns that into NaN parameter
    # gradients — one such gaussian permanently poisons itself and then the
    # whole model through Adam. Their outputs are never consumed (radius 0,
    # never binned), so the substitute value is arbitrary.
    tz_safe = jnp.where(in_front, tz, 1.0)

    # --- perspective projection to NDC, then pixels ---
    ph = means3d @ camera.full_proj[:3, :3].T + camera.full_proj[:3, 3]
    pw = means3d @ camera.full_proj[3, :3].T + camera.full_proj[3, 3]
    rw = 1.0 / jnp.where(in_front, pw + 1e-7, 1.0)
    ndc_xy = ph[:, :2] * rw[:, None]
    if ndc_offset is not None:
        ndc_xy = ndc_xy + ndc_offset
    pix = jnp.stack([
        ((ndc_xy[:, 0] + 1.0) * img_width - 1.0) * 0.5,
        ((ndc_xy[:, 1] + 1.0) * img_height - 1.0) * 0.5], axis=-1)

    # --- 3D covariance (packed symmetric) ---
    if cov3d_precomp is None:
        cov3d = transforms.build_covariance_packed(scales, quats,
                                                   scale_modifier)
    else:
        cov3d = cov3d_precomp
    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = (cov3d[:, i] for i in range(6))

    # --- EWA: cov2d = M Sigma M^T, M = J @ W3 (2x3 per Gaussian) ---
    fx = img_width / (2.0 * camera.tanfovx)
    fy = img_height / (2.0 * camera.tanfovy)
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    txz = jnp.clip(t[:, 0] / tz_safe, -limx, limx) * tz_safe
    tyz = jnp.clip(t[:, 1] / tz_safe, -limy, limy) * tz_safe
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J rows (only 2 nonzero rows matter)
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z2
    R3 = W[:3, :3]
    # M = J @ R3: row0 = j00*R3[0] + j02*R3[2]; row1 = j11*R3[1] + j12*R3[2]
    m0 = j00[:, None] * R3[0] + j02[:, None] * R3[2]   # (N, 3)
    m1 = j11[:, None] * R3[1] + j12[:, None] * R3[2]   # (N, 3)

    def sigma_vec(v):
        """Sigma @ v for packed symmetric Sigma, batched."""
        return jnp.stack([
            c_xx * v[:, 0] + c_xy * v[:, 1] + c_xz * v[:, 2],
            c_xy * v[:, 0] + c_yy * v[:, 1] + c_yz * v[:, 2],
            c_xz * v[:, 0] + c_yz * v[:, 1] + c_zz * v[:, 2]], axis=-1)

    s_m0 = sigma_vec(m0)
    s_m1 = sigma_vec(m1)
    cov00 = (m0 * s_m0).sum(-1) + LOWPASS
    cov01 = (m0 * s_m1).sum(-1)
    cov11 = (m1 * s_m1).sum(-1) + LOWPASS

    det = cov00 * cov11 - cov01 * cov01
    det_ok = det > 0.0
    # max() floor keeps inv_det finite for denormal dets: an inf conic on a
    # culled gaussian would leak NaN into the backward via 0 * inf.
    inv_det = jnp.where(det_ok, 1.0 / jnp.maximum(det, 1e-30), 0.0)
    conic = jnp.stack([cov11 * inv_det, -cov01 * inv_det, cov00 * inv_det],
                      axis=-1)

    mid = 0.5 * (cov00 + cov11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(RADIUS_SIGMA * jnp.sqrt(lam1))

    visible = in_front & det_ok
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # --- tile rects ---
    # Baseline follows CUDA getRect semantics: a square box of the 3-sigma
    # circumradius. When `opacities` is given, the box is tightened
    # per-axis with an EXACTNESS-PRESERVING bound: since the blend skips
    # any contribution with alpha < ALPHA_MIN, and the marginal-precision
    # inequality gives alpha(d) <= op * exp(-0.5 dx^2 / cov_xx), every
    # pixel with |dx| >= sqrt(2 ln(op/ALPHA_MIN) cov_xx) (same for y) is a
    # guaranteed skip — so culling its tile cannot change the image. This
    # is both opacity-aware (freshly reset gaussians shrink ~5x in area)
    # and anisotropic (thin splats stop paying for their circumradius);
    # pair counts drop 2-4x at identical output, which shrinks every
    # downstream cost (binning scan, blend chunks, backward scatter).
    grid_x = (img_width + tile_size - 1) // tile_size
    grid_y = (img_height + tile_size - 1) // tile_size
    rf = radius.astype(jnp.float32)
    # no-cull sentinel: larger than any reachable clamped distance^2 in
    # the binner's corner test (2 * 23000^2 < 2^30), so it never fires
    cull_r2 = jnp.full((n,), 1 << 30, jnp.int32)
    if opacities is not None:
        # stop_gradient: rects are integer binning decisions, and q's
        # log diverges as op -> 0 on culled slots.
        op = jax.lax.stop_gradient(opacities)
        op_ok = op > ALPHA_MIN
        q = 2.0 * jnp.log(jnp.maximum(op, ALPHA_MIN) / ALPHA_MIN) + 1e-6
        rx = jnp.minimum(jnp.sqrt(q * jnp.maximum(cov00, 0.0)), rf)
        ry = jnp.minimum(jnp.sqrt(q * jnp.maximum(cov11, 0.0)), rf)
        rx = jnp.where(op_ok, rx, 0.0)
        ry = jnp.where(op_ok, ry, 0.0)
        radius = jnp.where(op_ok, radius, 0)
        # Corner-cull radius for the binner: power <= -0.5 d^2 / lam1
        # (lam1 >= the true largest covariance eigenvalue — the 0.1 floor
        # only overestimates, which is conservative), so every pixel with
        # d^2 > q * lam1 has alpha < ALPHA_MIN and is a guaranteed
        # blend-gate skip. +64 absorbs f32 rounding of the product
        # (rel err ~1e-7 at the 2^30 clamp).
        cull_r2 = jnp.minimum(
            jnp.ceil(q * lam1) + 64.0, float(1 << 30)).astype(jnp.int32)
    else:
        rx = ry = rf
    rect_min = jnp.stack([
        jnp.clip(((pix[:, 0] - rx) / tile_size).astype(jnp.int32), 0, grid_x),
        jnp.clip(((pix[:, 1] - ry) / tile_size).astype(jnp.int32), 0, grid_y)],
        axis=-1)
    rect_max = jnp.stack([
        jnp.clip(((pix[:, 0] + rx + tile_size - 1) / tile_size).astype(jnp.int32),
                 0, grid_x),
        jnp.clip(((pix[:, 1] + ry + tile_size - 1) / tile_size).astype(jnp.int32),
                 0, grid_y)], axis=-1)
    spans = jnp.maximum(rect_max - rect_min, 0)
    tiles_touched = jnp.where(radius > 0, spans[:, 0] * spans[:, 1], 0)
    # Zero the rect span for untouched gaussians so downstream binning is clean.
    rect_max = jnp.where((tiles_touched > 0)[:, None], rect_max, rect_min)

    return Projected(pix=pix, depth=tz, conic=conic, radius=radius,
                     rect_min=rect_min, rect_max=rect_max,
                     tiles_touched=tiles_touched, cull_r2=cull_r2)
