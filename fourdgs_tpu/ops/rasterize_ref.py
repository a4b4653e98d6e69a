"""Oracle rasterizer: exact per-pixel alpha compositing in plain jnp.

This is the numerical specification for every fast path (tiled XLA blend,
Pallas kernels). Feasible for small images / point counts; used by tests as
ground truth for forward images AND jax.grad gradients.

Blending semantics spec (shared by all implementations in this framework;
mirrors the reference CUDA rasterizer's forward loop, with one deliberate
difference noted below):
  * gaussians are composited in ascending view-depth order
  * alpha_i = min(0.99, opacity_i * exp(power_i)),
    power_i = -0.5*(A dx^2 + C dy^2) - B dx dy,  d = splat_center - pixel
  * a gaussian is skipped at a pixel if alpha_i < 1/255
  * a gaussian contributes at a pixel only while the ENTERING transmittance
    T_i > 1e-4 (prefix test; monotone => naturally "sticky"). The CUDA
    implementation instead kills the gaussian whose inclusion would cross
    1e-4; the two rules differ by at most one splat carrying <=1e-4 weight,
    below 8-bit quantization. The prefix rule is order-parallel and
    chunk-decomposable, which is what makes the TPU kernels fast.
  * a gaussian covers only pixels whose tile lies in its projected rect
    (3-sigma radius box), like the CUDA tile binning
  * out_color = sum_i c_i alpha_i T_i + T_final * bg
  * out_depth = sum_i z_i alpha_i T_i   (expected depth, unnormalized, as in
    the depth-diff-gaussian-rasterization fork the reference builds on)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.ops.projection import (ALPHA_MAX, ALPHA_MIN, Projected,
                                        project_gaussians)

T_MIN = 1e-4


class RenderOutput(NamedTuple):
    color: jnp.ndarray        # (H, W, 3)
    depth: jnp.ndarray        # (H, W)
    alpha: jnp.ndarray        # (H, W) = 1 - T_final
    radii: jnp.ndarray        # (N,) int32
    # extras for densification stats (populated by the fast path too)
    visibility: jnp.ndarray   # (N,) bool
    # binner overflow telemetry (fixed-capacity buffers drop the furthest
    # pairs when a scene exceeds tile_cap/pair_cap; training quality
    # degrades silently unless these are surfaced — None from the oracle,
    # which has no caps)
    dropped_pairs: jnp.ndarray | None = None   # () int32
    dropped_tile: jnp.ndarray | None = None    # () int32
    num_pairs: jnp.ndarray | None = None       # () int32 total (pre-cap)
    tile_peak: jnp.ndarray | None = None       # () int32 max true per-tile
    #                                            count (pre-cap)


def _pixel_grid(height: int, width: int):
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    return jnp.meshgrid(xs, ys)  # each (H, W); pixel coords are integer centers


@functools.partial(jax.jit, static_argnames=("img_width", "img_height", "tile_size"))
def rasterize_reference(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,     # (N,) activated in (0, 1)
    colors: jnp.ndarray,        # (N, 3) precomputed RGB
    camera: Camera,
    img_width: int,
    img_height: int,
    bg: jnp.ndarray,            # (3,)
    tile_size: int = 16,
    ndc_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
) -> RenderOutput:
    n = means3d.shape[0]
    proj = project_gaussians(means3d, scales, quats, camera, img_width,
                             img_height, tile_size, ndc_offset=ndc_offset,
                             alive=alive, opacities=opacities)

    visible = proj.tiles_touched > 0
    # Depth sort with invisible pushed to the back.
    sort_depth = jnp.where(visible, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)

    px, py = _pixel_grid(img_height, img_width)         # (H, W)
    tile_x = (px / tile_size).astype(jnp.int32)
    tile_y = (py / tile_size).astype(jnp.int32)

    def body(carry, i):
        color_acc, depth_acc, T = carry
        g = jax.tree.map(lambda a: a[i], proj)
        vis = visible[i]
        dx = g.pix[0] - px
        dy = g.pix[1] - py
        power = (-0.5 * (g.conic[0] * dx * dx + g.conic[2] * dy * dy)
                 - g.conic[1] * dx * dy)
        alpha = jnp.where(
            power > 0.0, 0.0,
            jnp.minimum(ALPHA_MAX,
                        opacities[i] * jnp.exp(jnp.minimum(power, 0.0))))
        in_rect = ((tile_x >= g.rect_min[0]) & (tile_x < g.rect_max[0])
                   & (tile_y >= g.rect_min[1]) & (tile_y < g.rect_max[1]))
        use = vis & in_rect & (alpha >= ALPHA_MIN) & (T > T_MIN)
        a = jnp.where(use, alpha, 0.0)
        w = a * T
        color_acc = color_acc + w[..., None] * colors[i]
        depth_acc = depth_acc + w * g.depth
        T = T * (1.0 - a)
        return (color_acc, depth_acc, T), None

    init = (jnp.zeros((img_height, img_width, 3)),
            jnp.zeros((img_height, img_width)),
            jnp.ones((img_height, img_width)))
    (color, depth, T), _ = jax.lax.scan(body, init, order)
    color = color + T[..., None] * bg
    return RenderOutput(color=color, depth=depth, alpha=1.0 - T,
                        radii=proj.radius, visibility=proj.radius > 0)
