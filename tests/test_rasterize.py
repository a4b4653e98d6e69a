"""Rasterizer correctness: tiled XLA path vs the per-pixel oracle.

Forward images and jax.grad gradients must agree; analytic sanity checks
pin down conventions (a gaussian at the camera axis lands mid-image, etc.).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.data.camera import make_camera
from fourdgs_tpu.ops.rasterize_ref import rasterize_reference
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, bin_gaussians, rasterize
from fourdgs_tpu.ops.projection import project_gaussians


W, H = 64, 48
FOV = 1.0


def simple_camera(time=0.0):
    # camera at origin looking down +z (identity R, zero T)
    return make_camera(np.eye(3), np.zeros(3), FOV, FOV, time=time)


def random_scene(rng, n=64):
    means = np.stack([
        rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))


@pytest.fixture(scope="module")
def scene():
    return random_scene(np.random.default_rng(42))


CFG = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=128,
                   pair_cap=4096, chunk=8)


class TestProjection:
    def test_center_point_projects_to_image_center(self):
        cam = simple_camera()
        p = project_gaussians(jnp.array([[0.0, 0, 4.0]]),
                              jnp.array([[0.1, 0.1, 0.1]]),
                              jnp.array([[1.0, 0, 0, 0]]), cam, W, H, 16)
        np.testing.assert_allclose(p.pix[0], [(W - 1) / 2, (H - 1) / 2],
                                   atol=1e-3)
        assert p.depth[0] == pytest.approx(4.0)
        assert p.radius[0] > 0

    def test_behind_camera_culled(self):
        cam = simple_camera()
        p = project_gaussians(jnp.array([[0.0, 0, -4.0]]),
                              jnp.array([[0.1, 0.1, 0.1]]),
                              jnp.array([[1.0, 0, 0, 0]]), cam, W, H, 16)
        assert p.radius[0] == 0
        assert p.tiles_touched[0] == 0

    def test_isotropic_conic(self):
        # isotropic gaussian through square pixels: conic isotropic, B ~ 0
        fovy = 2 * np.arctan(np.tan(FOV / 2) * H / W)  # square pixels
        cam = make_camera(np.eye(3), np.zeros(3), FOV, fovy)
        p = project_gaussians(jnp.array([[0.0, 0, 4.0]]),
                              jnp.array([[0.2, 0.2, 0.2]]),
                              jnp.array([[1.0, 0, 0, 0]]), cam, W, H, 16)
        conic = np.asarray(p.conic[0])
        assert conic[0] == pytest.approx(conic[2], rel=2e-2)
        assert abs(conic[1]) < 1e-4 * conic[0]

    def test_alive_mask_culls(self, scene):
        cam = simple_camera()
        means, scales, quats, _, _ = scene
        alive = jnp.zeros(means.shape[0], bool)
        p = project_gaussians(means, scales, quats, cam, W, H, 16, alive=alive)
        assert int(p.tiles_touched.sum()) == 0


class TestBinning:
    def test_counts_conserved(self, scene):
        cam = simple_camera()
        means, scales, quats, _, _ = scene
        proj = project_gaussians(means, scales, quats, cam, W, H, CFG.tile_size)
        binned = bin_gaussians(proj, CFG)
        assert int(binned.dropped_pairs) == 0
        assert int(binned.dropped_tile) == 0
        assert int(binned.counts.sum()) == int(proj.tiles_touched.sum())
        # every non-pad index is a real visible gaussian
        gidx = np.asarray(binned.gidx)
        valid = gidx[gidx >= 0]
        assert np.all(np.asarray(proj.tiles_touched)[valid] > 0)

    def test_depth_ordered_within_tile(self, scene):
        cam = simple_camera()
        means, scales, quats, _, _ = scene
        proj = project_gaussians(means, scales, quats, cam, W, H, CFG.tile_size)
        binned = bin_gaussians(proj, CFG)
        depth = np.asarray(proj.depth)
        gidx = np.asarray(binned.gidx)
        counts = np.asarray(binned.counts)
        for t in range(gidx.shape[0]):
            d = depth[gidx[t, : counts[t]]]
            assert np.all(np.diff(d) >= 0)

    def test_overflow_counted_not_crashing(self, scene):
        cam = simple_camera()
        means, scales, quats, _, _ = scene
        tiny = RasterConfig(img_width=W, img_height=H, tile_size=16,
                            tile_cap=2, pair_cap=16, chunk=2)
        proj = project_gaussians(means, scales, quats, cam, W, H, 16)
        binned = bin_gaussians(proj, tiny)
        # dropped_pairs counts pair-budget drops only; tile-cap drops are
        # counted separately by dropped_tile (no double counting)
        assert int(binned.dropped_pairs) + int(binned.dropped_tile) > 0
        assert binned.gidx.shape == (tiny.num_tiles, 2)

    def test_overflow_surfaces_in_render_output(self, scene):
        """rasterize() must report binner overflow so the train loop can
        log it — a capped scene must not degrade silently (VERDICT r1)."""
        cam = simple_camera()
        means, scales, quats, opac, colors = scene
        tiny = RasterConfig(img_width=W, img_height=H, tile_size=16,
                            tile_cap=2, pair_cap=16, chunk=2)
        out = rasterize(means, scales, quats, opac, colors, cam,
                        jnp.zeros(3), tiny)
        assert int(out.dropped_pairs) + int(out.dropped_tile) > 0
        clean = rasterize(means, scales, quats, opac, colors, cam,
                          jnp.zeros(3), CFG)
        assert int(clean.dropped_pairs) == 0
        assert int(clean.dropped_tile) == 0


class TestForwardVsOracle:
    def test_image_matches(self, scene):
        cam = simple_camera()
        means, scales, quats, opac, colors = scene
        bg = jnp.zeros(3)
        ref = rasterize_reference(means, scales, quats, opac, colors, cam,
                                  W, H, bg, tile_size=16)
        out = rasterize(means, scales, quats, opac, colors, cam, bg, CFG)
        np.testing.assert_allclose(out.color, ref.color, atol=2e-5)
        np.testing.assert_allclose(out.depth, ref.depth, atol=2e-4)
        np.testing.assert_allclose(out.alpha, ref.alpha, atol=2e-5)
        np.testing.assert_array_equal(out.radii, ref.radii)

    def test_white_background(self, scene):
        cam = simple_camera()
        means, scales, quats, opac, colors = scene
        bg = jnp.ones(3)
        ref = rasterize_reference(means, scales, quats, opac, colors, cam,
                                  W, H, bg, tile_size=16)
        out = rasterize(means, scales, quats, opac, colors, cam, bg, CFG)
        np.testing.assert_allclose(out.color, ref.color, atol=2e-5)

    def test_empty_scene_is_background(self):
        cam = simple_camera()
        n = 4
        means = jnp.full((n, 3), -100.0)  # far behind camera
        out = rasterize(means, jnp.ones((n, 3)) * 0.1,
                        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
                        jnp.ones(n) * 0.5, jnp.ones((n, 3)) * 0.5,
                        cam, jnp.array([0.2, 0.4, 0.6]), CFG)
        np.testing.assert_allclose(
            out.color, jnp.broadcast_to(jnp.array([0.2, 0.4, 0.6]), (H, W, 3)),
            atol=1e-6)
        np.testing.assert_allclose(out.alpha, 0.0, atol=1e-6)

    def test_occlusion_order(self):
        """A front red gaussian must occlude a rear green one."""
        cam = simple_camera()
        means = jnp.array([[0.0, 0, 3.0], [0.0, 0, 5.0]])
        scales = jnp.array([[0.3, 0.3, 0.3]] * 2)
        quats = jnp.array([[1.0, 0, 0, 0]] * 2)
        opac = jnp.array([0.95, 0.95])
        colors = jnp.array([[1.0, 0, 0], [0.0, 1, 0]])
        out = rasterize(means, scales, quats, opac, colors, cam, jnp.zeros(3),
                        CFG)
        center = np.asarray(out.color[H // 2, W // 2])
        assert center[0] > 0.9
        assert center[1] < 0.06


class TestGradientsVsOracle:
    def test_grads_match(self, scene):
        cam = simple_camera()
        means, scales, quats, opac, colors = scene
        bg = jnp.zeros(3)
        target = jnp.zeros((H, W, 3))

        def loss_ref(m, s, q, o, c):
            img = rasterize_reference(m, s, q, o, c, cam, W, H, bg,
                                      tile_size=16).color
            return ((img - target) ** 2).mean()

        def loss_tiled(m, s, q, o, c):
            img = rasterize(m, s, q, o, c, cam, bg, CFG).color
            return ((img - target) ** 2).mean()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, opac, colors)
        g_tl = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, opac, colors)
        names = ["means", "scales", "quats", "opac", "colors"]
        for name, a, b in zip(names, g_ref, g_tl):
            scale = np.abs(np.asarray(a)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-4,
                err_msg=f"grad mismatch for {name}")

    def test_depth_and_alpha_grads(self, scene):
        """Gradients must also flow through depth and alpha outputs."""
        cam = simple_camera()
        means, scales, quats, opac, colors = scene
        bg = jnp.zeros(3)

        def loss_ref(m, o):
            out = rasterize_reference(m, scales, quats, o, colors, cam, W, H,
                                      bg, tile_size=16)
            return out.depth.mean() + (out.alpha ** 2).mean()

        def loss_tiled(m, o):
            out = rasterize(m, scales, quats, o, colors, cam, bg, CFG)
            return out.depth.mean() + (out.alpha ** 2).mean()

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(means, opac)
        g_tl = jax.grad(loss_tiled, argnums=(0, 1))(means, opac)
        for a, b in zip(g_ref, g_tl):
            scale = np.abs(np.asarray(a)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale, atol=2e-4)

    def test_ndc_offset_grad_carrier(self, scene):
        """The zero ndc_offset input must receive the screen-space gradient
        used for densification stats (ref train.py:223-225)."""
        cam = simple_camera()
        means, scales, quats, opac, colors = scene
        bg = jnp.zeros(3)
        zeros = jnp.zeros((means.shape[0], 2))

        def loss(off):
            img = rasterize(means, scales, quats, opac, colors, cam, bg, CFG,
                            ndc_offset=off).color
            return (img ** 2).mean()

        g = jax.grad(loss)(zeros)
        assert g.shape == zeros.shape
        assert np.abs(np.asarray(g)).max() > 0
