"""Mosaic-compiled kernel parity on a REAL TPU.

Asserts the Pallas blend forward/backward (ops/pallas/blend.py, compiled by
Mosaic — not the interpreter) against the per-pixel oracle
(ops/rasterize_ref.py) and the XLA blend, images AND gradients. Tolerances
are wider than the CPU suite: on-device f32 accumulation order differs and
the binner's cumsum-as-matmul runs bf16-in/f32-accumulate.

Run: python -m pytest tests_tpu -q   (skips without a TPU)
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data.camera import make_camera
from fourdgs_tpu.ops.rasterize_ref import rasterize_reference
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize

W, H = 64, 64
FOV = 1.0


def _scene(n=192, seed=3):
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))


def _cfg(backend):
    return RasterConfig(img_width=W, img_height=H, tile_size=32,
                        tile_cap=256, pair_cap=1 << 14, chunk=32,
                        backend=backend)


def _near_gate_mask(means, scales, quats, opac, cam, atol=2e-3):
    """(H, W) bool: pixels where SOME splat's alpha sits within `atol` of
    the 1/255 inclusion gate — the pixels whose compositing set may
    legitimately differ between implementations (a float-accumulation ULP
    flips the `alpha >= 1/255` comparison)."""
    from fourdgs_tpu.ops.projection import project_gaussians
    from fourdgs_tpu.ops.rasterize_ref import ALPHA_MAX, ALPHA_MIN
    proj = project_gaussians(means, scales, quats, cam, W, H, 32)
    pix = np.asarray(proj.pix)            # (N, 2)
    conic = np.asarray(proj.conic)        # (N, 3)
    live = np.asarray(proj.radius) > 0
    op = np.asarray(opac)
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    near = np.zeros((H, W), bool)
    for i in np.nonzero(live)[0]:
        dx = pix[i, 0] - xs
        dy = pix[i, 1] - ys
        power = (-0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                 - conic[i, 1] * dx * dy)
        alpha = np.minimum(np.where(power > 0, 0.0,
                                    op[i] * np.exp(np.minimum(power, 0.0))),
                           ALPHA_MAX)
        near |= np.abs(alpha - ALPHA_MIN) < atol
    return near


def test_forward_matches_oracle_on_device():
    cam = make_camera(np.eye(3), np.zeros(3), FOV, FOV)
    means, scales, quats, opac, colors = _scene()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    ref = rasterize_reference(means, scales, quats, opac, colors, cam,
                              W, H, bg)
    out = jax.jit(lambda *a: rasterize(*a, cam, bg, _cfg("pallas")))(
        means, scales, quats, opac, colors)
    # Device parity is gate-limited, not accumulation-limited: pixels
    # where a splat's alpha sits at the 1/255 inclusion gate can flip
    # between implementations (CUDA shows the same cross-impl behavior).
    # CAUSAL accounting (VERDICT r3 weak #6): every pixel beyond the tight
    # tolerance must actually HAVE a near-gate splat — a kernel bug
    # touching arbitrary pixels fails this even below the 1% budget.
    dc = np.abs(np.asarray(out.color) - np.asarray(ref.color)).max(axis=-1)
    offending = dc > 5e-3
    assert offending.mean() < 0.01, (dc.max(), offending.mean())
    assert dc.max() < 5e-2, dc.max()
    if offending.any():
        near = _near_gate_mask(means, scales, quats, opac, cam)
        unexplained = offending & ~near
        assert not unexplained.any(), (
            f"{unexplained.sum()} deviating pixels have no near-gate "
            f"splat: {np.argwhere(unexplained)[:5]}")
    dd = np.abs(np.asarray(out.depth) - np.asarray(ref.depth))
    assert (dd > 5e-2).mean() < 0.01 and dd.max() < 0.5, dd.max()


def test_gradients_match_xla_on_device():
    """Pallas bwd kernel (Mosaic) vs the XLA custom-VJP blend, all five
    per-gaussian gradient groups."""
    cam = make_camera(np.eye(3), np.zeros(3), FOV, FOV)
    means, scales, quats, opac, colors = _scene()
    bg = jnp.zeros(3)
    tgt = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (H, W, 3)), jnp.float32)

    def loss(backend):
        def f(ms, sc, qs, op, co):
            out = rasterize(ms, sc, qs, op, co, cam, bg, _cfg(backend))
            return jnp.abs(out.color - tgt).mean() + out.depth.mean() * 0.1
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))

    ga = loss("xla")(means, scales, quats, opac, colors)
    gb = loss("pallas")(means, scales, quats, opac, colors)
    names = ("means", "scales", "quats", "opac", "colors")
    for name, a, b in zip(names, ga, gb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-8)
        d = np.abs(b - a)
        # distribution check (alpha-gate flips perturb a few entries):
        # <1% of entries beyond 0.5% of max-grad, none beyond 5%
        frac = (d > 5e-3 * scale).mean()
        assert frac < 0.01 and d.max() < 5e-2 * scale, (
            f"grad mismatch: {name} frac={frac:.4f} "
            f"max={d.max():.3e} scale={scale:.3e}")


def test_gradients_match_oracle_on_device():
    """Pallas bwd vs jax.grad through the per-pixel oracle (no custom VJP
    anywhere in the oracle path)."""
    cam = make_camera(np.eye(3), np.zeros(3), FOV, FOV)
    means, scales, quats, opac, colors = _scene(n=96, seed=7)
    bg = jnp.zeros(3)

    def f_ref(op):
        out = rasterize_reference(means, scales, quats, op, colors, cam,
                                  W, H, bg)
        return out.color.sum()

    def f_pl(op):
        out = rasterize(means, scales, quats, op, colors, cam, bg,
                        _cfg("pallas"))
        return out.color.sum()

    ga = jax.jit(jax.grad(f_ref))(opac)
    gb = jax.jit(jax.grad(f_pl))(opac)
    ga, gb = np.asarray(ga), np.asarray(gb)
    scale = max(float(np.abs(ga).max()), 1e-8)
    d = np.abs(gb - ga)
    assert (d > 5e-3 * scale).mean() < 0.01 and d.max() < 5e-2 * scale, (
        d.max(), scale)


def test_ssim_sane_on_device():
    """TPU convs default to bf16 multiplies; SSIM's variance terms are
    catastrophic cancellations, and without precision=HIGHEST device-side
    SSIM measured > 3 on near-white images. Pin the invariants."""
    from fourdgs_tpu.ops import losses
    rng = np.random.default_rng(0)
    base = np.ones((1, 256, 256, 3), np.float32)
    base[:, 60:200, 60:200] = rng.uniform(0, 1, (1, 140, 140, 3))
    noisy = np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1)
    a, b = jnp.asarray(base), jnp.asarray(noisy, jnp.float32)
    s_self = float(losses.ssim(a, a))
    s_pair = float(losses.ssim(a, b))
    ms_pair = float(losses.ms_ssim(a, b)[0])
    assert abs(s_self - 1.0) < 1e-3, s_self
    assert 0.0 < s_pair < 1.0, s_pair
    assert 0.0 < ms_pair < 1.0, ms_pair
