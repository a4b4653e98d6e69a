"""Training-layer tests: optimizer groups, densify/prune/reset surgery, and
an end-to-end smoke test that optimizes a synthetic scene (the framework's
substitute for the reference's metric-based QA, SURVEY.md §4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.data.camera import make_camera
from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.ops.rasterize_ref import rasterize_reference
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig
from fourdgs_tpu.train import densify as densify_mod
from fourdgs_tpu.train import loop, optim, state as state_mod
from fourdgs_tpu.train.config import Config, ModelHiddenParams, RasterParams


def tiny_config(cap=2048):
    cfg = Config()
    cfg.model.sh_degree = 1
    cfg.raster = RasterParams(capacity=cap, tile_size=16, tile_cap=256,
                              pair_cap=1 << 14, chunk=8)
    cfg.hidden.kplanes_config["resolution"] = [8, 8, 8, 4]
    cfg.hidden.kplanes_config["output_coordinate_dim"] = 8
    cfg.hidden.multires = [1, 2]
    cfg.hidden.net_width = 32
    return cfg


def make_state(cfg, n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return state_mod.create_state(jax.random.key(seed), cfg, pts, cols,
                                  spatial_lr_scale=1.0)


class TestOptimizer:
    def test_labels_cover_params(self):
        cfg = tiny_config()
        st = make_state(cfg)
        labels = optim.param_labels(st.params)
        flat_p = jax.tree.leaves(st.params)
        flat_l = jax.tree.leaves(labels)
        assert len(flat_p) == len(flat_l)
        assert set(flat_l) <= {"xyz", "f_dc", "f_rest", "scaling", "rotation",
                               "opacity", "grid", "deformation"}

    def test_schedule_groups(self):
        cfg = tiny_config()
        sched = optim.build_schedules(cfg.opt, spatial_lr_scale=2.0)
        assert float(sched["xyz"](0)) == pytest.approx(
            cfg.opt.position_lr_init * 2.0, rel=1e-5)
        assert float(sched["f_rest"](123)) == pytest.approx(
            cfg.opt.feature_lr / 20.0, rel=1e-6)

    def test_update_moves_params(self):
        cfg = tiny_config()
        st = make_state(cfg)
        tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
        grads = jax.tree.map(jnp.ones_like, st.params)
        updates, _ = tx.update(grads, st.opt_state, st.params)
        # adam first step: update magnitude = lr (bias-corrected)
        xyz_up = np.asarray(updates["gauss"].xyz)
        assert np.allclose(np.abs(xyz_up), cfg.opt.position_lr_init, rtol=1e-3)
        assert np.all(xyz_up < 0)  # descent direction

    def test_moment_reset(self):
        cfg = tiny_config()
        st = make_state(cfg)
        tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
        grads = jax.tree.map(jnp.ones_like, st.params)
        _, opt_state = tx.update(grads, st.opt_state, st.params)
        mask = jnp.zeros((st.capacity,), bool).at[3].set(True)
        opt_state2 = optim.reset_moments_for_slots(opt_state, mask, st.params)
        mu, _ = optim.moments_view(opt_state2, st.params)
        assert float(jnp.abs(mu["gauss"].xyz[3]).sum()) == 0
        assert float(jnp.abs(mu["gauss"].xyz[4]).sum()) > 0
        # group-specific reset touches only opacity
        opt_state3 = optim.reset_moments_for_slots(
            opt_state, jnp.ones((st.capacity,), bool), st.params,
            group="opacity")
        mu3, _ = optim.moments_view(opt_state3, st.params)
        assert float(jnp.abs(mu3["gauss"].opacity).sum()) == 0
        assert float(jnp.abs(mu3["gauss"].xyz).sum()) > 0


class TestDensify:
    def _state_with_grads(self, cfg, n=32, big=(), grad_hot=()):
        st = make_state(cfg, n=n)
        accum = np.zeros(st.capacity, np.float32)
        accum[list(grad_hot)] = 10.0
        denom = np.zeros(st.capacity, np.float32)
        denom[:n] = 1.0
        scaling = np.asarray(st.params["gauss"].scaling).copy()
        scaling[list(big)] = np.log(5.0)  # huge -> split candidates
        gauss = st.params["gauss"]._replace(scaling=jnp.asarray(scaling))
        return st._replace(params={**st.params, "gauss": gauss},
                           xyz_gradient_accum=jnp.asarray(accum),
                           denom=jnp.asarray(denom))

    def test_clone_copies_small_high_grad(self):
        cfg = tiny_config(cap=64)
        st = self._state_with_grads(cfg, n=32, grad_hot=[1, 2])
        n0 = int(st.alive.sum())
        st2, stats = densify_mod.densify(st, jax.random.key(0), 0.5,
                                         percent_dense=0.01, extent=100.0,
                                         max_points=1000)
        # extent huge -> all scales "small" -> clones, no splits
        assert int(stats.n_cloned) == 2
        assert int(stats.n_split) == 0
        assert int(st2.alive.sum()) == n0 + 2
        # clone copies the source params into a free slot
        g2 = st2.params["gauss"]
        xyz = np.asarray(g2.xyz)
        assert np.any(np.all(np.isclose(xyz[32:], xyz[1]), axis=-1))

    def test_split_replaces_and_allocates(self):
        cfg = tiny_config(cap=64)
        st = self._state_with_grads(cfg, n=32, big=[5], grad_hot=[5])
        xyz_before = np.asarray(st.params["gauss"].xyz[5]).copy()
        st2, stats = densify_mod.densify(st, jax.random.key(0), 0.5,
                                         percent_dense=0.01, extent=1.0,
                                         max_points=1000)
        assert int(stats.n_split) == 1
        assert int(st2.alive.sum()) == 33
        # original slot got resampled + rescaled
        g2 = st2.params["gauss"]
        assert not np.allclose(np.asarray(g2.xyz[5]), xyz_before)
        np.testing.assert_allclose(np.asarray(g2.scaling[5]),
                                   np.log(5.0 / 1.6), atol=1e-5)

    def test_stats_cleared_after_densify(self):
        cfg = tiny_config(cap=64)
        st = self._state_with_grads(cfg, n=32, grad_hot=[0])
        st2, _ = densify_mod.densify(st, jax.random.key(0), 0.5, 0.01, 100.0,
                                     1000)
        assert float(st2.xyz_gradient_accum.sum()) == 0
        assert float(st2.denom.sum()) == 0

    def test_capacity_overflow_drops(self):
        cfg = tiny_config(cap=33)
        st = self._state_with_grads(cfg, n=32, grad_hot=list(range(10)))
        st2, stats = densify_mod.densify(st, jax.random.key(0), 0.5, 0.01,
                                         100.0, 1000)
        assert int(st2.alive.sum()) == 33  # only one free slot existed
        assert int(stats.n_dropped) == 9

    def test_prune_low_opacity(self):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=32)
        op = np.asarray(st.params["gauss"].opacity).copy()
        op[4] = -10.0  # sigmoid -> ~0
        gauss = st.params["gauss"]._replace(opacity=jnp.asarray(op))
        st = st._replace(params={**st.params, "gauss": gauss})
        st2 = densify_mod.prune(st, min_opacity=0.005, extent=1.0,
                                max_screen_size=None, min_points=0)
        assert int(st2.alive.sum()) == 31
        assert not bool(st2.alive[4])

    def test_prune_respects_min_points_gate(self):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=32)
        op = np.asarray(st.params["gauss"].opacity).copy()
        op[:] = -10.0
        gauss = st.params["gauss"]._replace(opacity=jnp.asarray(op))
        st = st._replace(params={**st.params, "gauss": gauss})
        st2 = densify_mod.prune(st, 0.005, 1.0, None, min_points=1000)
        assert int(st2.alive.sum()) == 32  # gate blocked pruning

    def test_reset_opacity(self):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=32)
        st2 = densify_mod.reset_opacity(st)
        new_op = np.asarray(jax.nn.sigmoid(st2.params["gauss"].opacity[:32, 0]))
        np.testing.assert_allclose(new_op, 0.01, atol=1e-5)


class TestBucketing:
    def test_pick_bucket(self):
        assert loop.pick_bucket(10, 400_000) == 4096
        assert loop.pick_bucket(3000, 400_000) == 8192
        assert loop.pick_bucket(300_000, 400_000) == 400_000
        # above 64k, buckets are 64k MULTIPLES, not powers of two
        assert loop.pick_bucket(360_000, 1 << 22, headroom=1.0) == 393_216
        assert loop.pick_bucket(100_000, 1 << 22, headroom=1.0) == 131_072
        assert loop.pick_bucket(140_000, 1 << 22, headroom=1.0) == 196_608
        # pow2 ladder below 64k is unchanged
        assert loop.pick_bucket(30_000, 1 << 22, headroom=1.0) == 32_768

    def test_compact_and_resize_preserves_alive(self):
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=32)
        # kill a few slots to create holes
        alive = np.asarray(st.alive).copy()
        alive[[3, 7, 20]] = False
        st = st._replace(alive=jnp.asarray(alive))
        xyz_alive = np.asarray(st.params["gauss"].xyz)[alive]
        st2 = loop.compact_and_resize(st, 32)
        assert st2.capacity == 32
        assert int(st2.alive.sum()) == 29
        assert bool(st2.alive[:29].all())
        np.testing.assert_allclose(np.asarray(st2.params["gauss"].xyz[:29]),
                                   xyz_alive)


class TestGrow:
    def test_grow_adds_points(self):
        import jax
        cfg = tiny_config(cap=128)
        st = make_state(cfg, n=32)
        st2, n_added = densify_mod.grow(st, jax.random.key(0),
                                        displacement_scale=1.0,
                                        quantile=0.5, max_points=1000)
        assert int(n_added) > 0
        assert int(st2.alive.sum()) == 32 + int(n_added)
        # new points inherit appearance (opacity column identical to source)
        assert np.isfinite(np.asarray(st2.params["gauss"].xyz)).all()


class TestCompactionMomentSafety:
    def test_no_moment_contamination(self):
        """Regression: compact_and_resize must NOT inject the w=1 rotation
        fix into Adam moment trees (a zero-mu/tiny-nu slot would get a
        mu/(sqrt(nu)+eps) ~ 1e14 update next step)."""
        import jax
        cfg = tiny_config(cap=64)
        st = make_state(cfg, n=16)
        tx = optim.build_optimizer(cfg.opt, 1.0, st.params)
        st = st._replace(opt_state=tx.init(st.params))
        # moments exactly zero (fresh) -> resize up
        st2 = loop.compact_and_resize(st, 32)
        mu_t, nu_t = optim.moments_view(st2.opt_state, st2.params)
        mu = np.asarray(mu_t["gauss"].rotation)
        nu = np.asarray(nu_t["gauss"].rotation)
        assert np.abs(mu).max() == 0.0
        assert np.abs(nu).max() == 0.0
        # params DO get the w=1 fix for padded dead slots
        rot = np.asarray(st2.params["gauss"].rotation)
        assert (rot[16:, 0] == 1.0).all()
