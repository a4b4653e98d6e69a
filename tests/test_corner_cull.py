"""Corner cull exactness: pruning alpha-gate-unreachable (gaussian, tile)
pairs must not change the rendered image or its gradients, only shrink
per-tile counts.

The cull (ops/rasterize_tiled.bin_gaussians_count, gate radius from
ops/projection.cull_r2) drops pairs whose whole tile lies beyond
d^2 > 2 ln(op/ALPHA_MIN) * lam1 — every pixel of such a tile fails the
oracle's alpha >= 1/255 gate (ops/rasterize_ref.py blending spec), so the
contribution is exactly zero.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops.projection import project_gaussians
from fourdgs_tpu.ops.rasterize_ref import rasterize_reference
from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                             bin_gaussians_count, rasterize)
from tests.test_rasterize import H, W, random_scene, simple_camera

CFG = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=128,
                   pair_cap=4096, chunk=8, backend="xla")


def _proj(scene, cam, with_op):
    means, scales, quats, opac, _ = scene
    return project_gaussians(means, scales, quats, cam, W, H, 16,
                             opacities=opac if with_op else None)


def test_cull_fires_and_only_removes_gate_unreachable_pairs():
    rng = np.random.default_rng(3)
    # big anisotropic splats with mixed opacity -> multi-tile rects whose
    # AABB corners exceed the gate radius
    scene = random_scene(rng, n=96)
    means, scales, quats, opac, colors = scene
    scales = scales * 4.0
    cam = simple_camera()
    proj = project_gaussians(means, scales, quats, cam, W, H, 16,
                             opacities=opac)
    assert proj.cull_r2 is not None
    b_cull = bin_gaussians_count(proj, CFG)
    # same geometry, cull disabled via the no-cull sentinel
    proj_nc = proj._replace(
        cull_r2=jnp.full_like(proj.cull_r2, 1 << 30))
    b_nc = bin_gaussians_count(proj_nc, CFG)
    culled = int(b_nc.counts.sum()) - int(b_cull.counts.sum())
    assert culled > 0, "cull never fired on the stress scene"

    # every culled pair must be gate-unreachable: render both binnings
    # through the blend and compare images (identical up to float
    # association from shifted chunk boundaries)
    out_c = rasterize(means, scales, quats, opac, colors, cam,
                      jnp.zeros(3), CFG)
    oracle = rasterize_reference(means, scales, quats, opac, colors, cam,
                                 W, H, jnp.zeros(3), tile_size=16)
    np.testing.assert_allclose(np.asarray(out_c.color),
                               np.asarray(oracle.color), atol=2e-5)


def test_cull_preserves_gradients():
    rng = np.random.default_rng(4)
    means, scales, quats, opac, colors = random_scene(rng, n=48)
    scales = scales * 4.0
    cam = simple_camera()
    bg = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def loss_tiled(m, s, o):
        out = rasterize(m, s, quats, o, colors, cam, bg, CFG)
        return jnp.abs(out.color - target).mean()

    def loss_oracle(m, s, o):
        out = rasterize_reference(m, s, quats, o, colors, cam, W, H, bg,
                                  tile_size=16)
        return jnp.abs(out.color - target).mean()

    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2))(means, scales, opac)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(means, scales, opac)
    for a, b in zip(g_t, g_o):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
