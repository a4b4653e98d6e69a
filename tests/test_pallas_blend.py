"""Pallas blend kernels vs the XLA blend (interpret mode on CPU): forward
images and gradients must match to float tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize
from tests.test_rasterize import H, W, random_scene, simple_camera

XLA_CFG = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=64,
                       pair_cap=1 << 14, chunk=8, backend="xla")
PL_CFG = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=64,
                      pair_cap=1 << 14, chunk=8, backend="pallas",
                      fuse_pack=True)  # keep the fused-attr mode covered


@pytest.fixture(scope="module")
def scene():
    return random_scene(np.random.default_rng(11), n=96)


def test_forward_matches(scene):
    cam = simple_camera()
    means, scales, quats, opac, colors = scene
    bg = jnp.asarray([0.3, 0.1, 0.7])
    a = rasterize(means, scales, quats, opac, colors, cam, bg, XLA_CFG)
    b = rasterize(means, scales, quats, opac, colors, cam, bg, PL_CFG)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha),
                               atol=1e-5)


@pytest.mark.slow
def test_saturated_gradients_match():
    """Deep stack of near-opaque full-screen gaussians: every pixel of
    every tile block saturates (t <= T_MIN) after the first chunks, which
    exercises the backward kernel's saturation skip (zero-grad chunks must
    be written as zeros, and the recurrence state must pass through)."""
    rng = np.random.default_rng(7)
    n = 64
    means = np.stack([
        rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
        np.linspace(2.0, 6.0, n)], -1).astype(np.float32)
    scales = np.full((n, 3), 2.0, np.float32)      # huge: cover the image
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.9, 0.99, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
    cam = simple_camera()
    bg = jnp.asarray([0.2, 0.5, 0.9])
    target = jnp.zeros((H, W, 3))

    def make_loss(cfg):
        def loss(m, s, q, o, c):
            out = rasterize(m, s, q, o, c, cam, bg, cfg)
            return (((out.color - target) ** 2).mean()
                    + 0.1 * out.depth.mean() + 0.05 * (out.alpha ** 2).mean())
        return loss

    a_img = rasterize(*args, cam, bg, XLA_CFG)
    b_img = rasterize(*args, cam, bg, PL_CFG)
    # sanity: the scene really saturates (alpha ~ 1 everywhere)
    assert float(np.asarray(a_img.alpha).min()) > 0.999
    np.testing.assert_allclose(np.asarray(b_img.color),
                               np.asarray(a_img.color), atol=1e-5)
    ga = jax.grad(make_loss(XLA_CFG), argnums=(0, 1, 2, 3, 4))(*args)
    gb = jax.grad(make_loss(PL_CFG), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("msqoc", ga, gb):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-4,
                                   err_msg=name)


@pytest.mark.slow
def test_gradients_match(scene):
    cam = simple_camera()
    means, scales, quats, opac, colors = scene
    bg = jnp.asarray([1.0, 1.0, 1.0])
    target = jnp.zeros((H, W, 3))

    def make_loss(cfg):
        def loss(m, s, q, o, c):
            out = rasterize(m, s, q, o, c, cam, bg, cfg)
            return (((out.color - target) ** 2).mean()
                    + 0.1 * out.depth.mean() + 0.05 * (out.alpha ** 2).mean())
        return loss

    ga = jax.grad(make_loss(XLA_CFG), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors)
    gb = jax.grad(make_loss(PL_CFG), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors)
    for name, a, b in zip("msqoc", ga, gb):
        scale = np.abs(np.asarray(a)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-4,
                                   err_msg=name)
