"""Tests for the scene representation: Gaussian buffers, HexPlane,
deformation network, regularizers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.models import deformation, gaussians, hexplane, regularization


class TestGaussianInit:
    def test_create_from_points(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.uniform(size=(100, 3)).astype(np.float32)
        params, alive = gaussians.create_from_points(pts, cols, cap=128)
        assert params.xyz.shape == (128, 3)
        assert int(alive.sum()) == 100
        assert bool(alive[99]) and not bool(alive[100])
        # DC band holds RGB2SH colors
        from fourdgs_tpu.ops import sh
        np.testing.assert_allclose(np.asarray(params.features_dc[:100, 0]),
                                   np.asarray(sh.rgb_to_sh(jnp.asarray(cols))),
                                   atol=1e-6)
        # opacity activates to 0.1
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(params.opacity[:100, 0])), 0.1, atol=1e-5)
        # scale = log(sqrt(mean 3nn sq dist)) > -inf, identical across axes
        s = np.asarray(params.scaling[:100])
        assert np.all(np.isfinite(s))
        np.testing.assert_allclose(s[:, 0], s[:, 1])

    def test_capacity_overflow_raises(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        with pytest.raises(ValueError):
            gaussians.create_from_points(pts, pts, cap=5)


class TestHexPlane:
    CFG = hexplane.HexPlaneConfig(resolution=(8, 8, 8, 4), out_dim=4,
                                  multires=(1, 2))

    def test_init_shapes_and_time_ones(self):
        grids = hexplane.init_hexplane(jax.random.key(0), self.CFG)
        assert len(grids) == 12
        # plane 0 level 0: (x,y) -> (reso_y, reso_x, C) = (8, 8, 4)
        assert grids["l0_p0"].shape == (8, 8, 4)
        # plane 2 = (x,t): (reso_t, reso_x, C)
        assert grids["l0_p2"].shape == (4, 8, 4)
        # level 1 doubles spatial only
        assert grids["l1_p0"].shape == (16, 16, 4)
        assert grids["l1_p2"].shape == (4, 16, 4)
        # time planes init to 1
        np.testing.assert_allclose(grids["l0_p2"], 1.0)
        np.testing.assert_allclose(grids["l1_p5"], 1.0)

    def test_bilinear_sample_exact_corners(self):
        plane = jnp.arange(12.0).reshape(3, 4, 1)
        # (-1,-1) -> (x=0, y=0) -> value 0 ; (1,1) -> (3, 2) -> 11
        out = hexplane.bilinear_sample(plane, jnp.array([-1.0, 1.0]),
                                       jnp.array([-1.0, 1.0]))
        np.testing.assert_allclose(out[:, 0], [0.0, 11.0], atol=1e-6)

    def test_bilinear_midpoint(self):
        plane = jnp.array([[0.0, 1.0], [2.0, 3.0]])[..., None]
        out = hexplane.bilinear_sample(plane, jnp.array([0.0]), jnp.array([0.0]))
        assert out[0, 0] == pytest.approx(1.5)

    def test_border_clamp(self):
        plane = jnp.arange(4.0).reshape(2, 2, 1)
        out = hexplane.bilinear_sample(plane, jnp.array([5.0]), jnp.array([-7.0]))
        assert out[0, 0] == pytest.approx(1.0)  # clamp to (x=1, y=0)

    def test_features_shape_and_grad(self):
        grids = hexplane.init_hexplane(jax.random.key(0), self.CFG)
        pts = jnp.zeros((10, 3))
        t = jnp.full((10,), 0.5)
        feats = hexplane.hexplane_features(grids, self.CFG, pts, t)
        assert feats.shape == (10, 8)

        def f(g):
            return hexplane.hexplane_features(g, self.CFG, pts, t).sum()
        grads = jax.grad(f)(grids)
        total = sum(float(jnp.abs(g).sum()) for g in grads.values())
        assert total > 0

    def test_const_t_fast_path_matches_generic(self):
        """Scalar t (the training case) routes time planes through
        bilinear_sample_const_v; outputs AND grid gradients must match the
        generic per-point-t sampler."""
        grids = hexplane.init_hexplane(jax.random.key(1), self.CFG)
        # make time planes non-trivial (init is ones)
        grids = {k: v + 0.3 * jax.random.normal(jax.random.key(i), v.shape)
                 for i, (k, v) in enumerate(sorted(grids.items()))}
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-1.2, 1.2, (50, 3)), jnp.float32)
        for tv in (0.0, 0.37, 0.5, 1.0):
            a = hexplane.hexplane_features(
                grids, self.CFG, pts, jnp.full((50,), tv))
            b = hexplane.hexplane_features(
                grids, self.CFG, pts, jnp.float32(tv))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5, rtol=1e-5)

        def f(g, t):
            out = hexplane.hexplane_features(g, self.CFG, pts, t)
            return (out * jnp.sin(jnp.arange(out.size).reshape(out.shape))
                    ).sum()

        ga = jax.grad(f)(grids, jnp.full((50,), 0.37))
        gb = jax.grad(f)(grids, jnp.float32(0.37))
        for k in ga:
            np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(ga[k]),
                                       atol=1e-5, rtol=1e-4, err_msg=k)

    def test_const_v_sampler_matches_bilinear(self):
        plane = jnp.asarray(
            np.random.default_rng(0).normal(size=(5, 9, 3)), jnp.float32)
        u = jnp.linspace(-1.3, 1.3, 21)
        for v in (-1.0, -0.4, 0.0, 0.73, 1.0, 2.0):
            a = hexplane.bilinear_sample(plane, u, jnp.full((21,), v))
            b = hexplane.bilinear_sample_const_v(plane, u, jnp.float32(v))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6, err_msg=str(v))

    def test_normalize_aabb_reference_quirk(self):
        # rows are (max, min): max maps to -1, min to +1
        aabb = jnp.array([[2.0, 2.0, 2.0], [-2.0, -2.0, -2.0]])
        np.testing.assert_allclose(
            hexplane.normalize_aabb(jnp.array([[2.0, -2.0, 0.0]]), aabb)[0],
            [-1.0, 1.0, 0.0], atol=1e-6)


class TestDeformation:
    CFG = deformation.DeformConfig(
        net_width=32, defor_depth=1,
        grid=hexplane.HexPlaneConfig(resolution=(8, 8, 8, 4), out_dim=8,
                                     multires=(1, 2)))

    def _setup(self):
        params = deformation.init_deform(jax.random.key(0), self.CFG)
        aabb = jnp.array([[1.6] * 3, [-1.6] * 3])
        n = 20
        rng = np.random.default_rng(3)
        xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
        scal = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        rot = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        op = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
        shs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32))
        return params, aabb, (xyz, scal, rot, op, shs)

    def test_output_shapes(self):
        params, aabb, (xyz, scal, rot, op, shs) = self._setup()
        out = deformation.deform_apply(params, self.CFG, aabb, xyz, scal, rot,
                                       op, shs, jnp.float32(0.3))
        for a, b in zip(out, (xyz, scal, rot, op, shs)):
            assert a.shape == b.shape

    def test_default_ablations_identity(self):
        """no_do/no_dshs default True: opacity and shs pass through."""
        params, aabb, (xyz, scal, rot, op, shs) = self._setup()
        _, _, _, o2, s2 = deformation.deform_apply(
            params, self.CFG, aabb, xyz, scal, rot, op, shs, 0.1)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(op))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(shs))

    def test_time_dependence(self):
        """Time planes init to ones (no time dependence at init, as in the
        reference); perturbing a time plane must create it."""
        params, aabb, (xyz, scal, rot, op, shs) = self._setup()
        a0 = deformation.deform_apply(params, self.CFG, aabb, xyz, scal, rot,
                                      op, shs, 0.0)
        b0 = deformation.deform_apply(params, self.CFG, aabb, xyz, scal, rot,
                                      op, shs, 0.9)
        np.testing.assert_allclose(np.asarray(a0[0]), np.asarray(b0[0]),
                                   atol=1e-6)
        key = jax.random.key(7)
        params["grid"]["l0_p2"] = params["grid"]["l0_p2"] + \
            0.5 * jax.random.normal(key, params["grid"]["l0_p2"].shape)
        a = deformation.deform_apply(params, self.CFG, aabb, xyz, scal, rot,
                                     op, shs, 0.0)
        b = deformation.deform_apply(params, self.CFG, aabb, xyz, scal, rot,
                                     op, shs, 0.9)
        assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))

    def test_all_ablations_identity(self):
        cfg = deformation.DeformConfig(
            net_width=32, defor_depth=1, grid=self.CFG.grid,
            no_dx=True, no_ds=True, no_dr=True)
        params, aabb, (xyz, scal, rot, op, shs) = self._setup()
        out = deformation.deform_apply(params, cfg, aabb, xyz, scal, rot, op,
                                       shs, 0.5)
        for a, b in zip(out, (xyz, scal, rot, op, shs)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grid_mlp_param_split(self):
        params, _, _ = self._setup()
        assert set(params.keys()) == {"grid", "mlp"}
        assert "timenet" in params["mlp"]

    def test_no_grid_path(self):
        cfg = dataclassesreplace = deformation.DeformConfig(
            net_width=32, defor_depth=1, grid=self.CFG.grid, no_grid=True)
        params = deformation.init_deform(jax.random.key(1), cfg)
        aabb = jnp.array([[1.6] * 3, [-1.6] * 3])
        _, _, (xyz, scal, rot, op, shs) = ("_", "_", self._setup()[2])
        out = deformation.deform_apply(params, cfg, aabb, xyz, scal, rot, op,
                                       shs, 0.5)
        assert out[0].shape == xyz.shape


class TestRegularization:
    def test_plane_smoothness_zero_for_linear(self):
        # linear ramp along axis 0 has zero second difference
        plane = jnp.broadcast_to(jnp.arange(8.0)[:, None, None], (8, 4, 2))
        assert float(regularization.plane_smoothness(plane)) == pytest.approx(0.0)

    def test_plane_smoothness_positive_for_curvature(self):
        plane = (jnp.arange(8.0)[:, None, None] ** 2) * jnp.ones((8, 4, 2))
        assert float(regularization.plane_smoothness(plane)) > 0

    def test_split_space_time(self):
        cfg = hexplane.HexPlaneConfig(resolution=(4, 4, 4, 4), out_dim=2,
                                      multires=(1,))
        grids = hexplane.init_hexplane(jax.random.key(0), cfg)
        # time planes are all ones -> l1 = 0, time smoothness = 0
        assert float(regularization.l1_time_regulation(grids)) == pytest.approx(0.0)
        assert float(regularization.time_regulation(grids)) == pytest.approx(0.0)
        assert float(regularization.plane_regulation(grids)) > 0
        # perturb one time plane -> l1 becomes positive
        grids["l0_p2"] = grids["l0_p2"] + 0.5
        assert float(regularization.l1_time_regulation(grids)) == pytest.approx(0.5)


class TestMaskingPaths:
    def test_static_mlp_and_empty_voxel(self):
        import dataclasses as dc
        base = TestDeformation.CFG
        rng = np.random.default_rng(3)
        n = 10
        xyz = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
        scal = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        rot = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        op = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
        shs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32))
        aabb = jnp.array([[1.6] * 3, [-1.6] * 3])
        for kwargs in ({"static_mlp": True}, {"empty_voxel": True}):
            cfg = dc.replace(base, **kwargs)
            params = deformation.init_deform(jax.random.key(0), cfg)
            out = deformation.deform_apply(params, cfg, aabb, xyz, scal, rot,
                                           op, shs, 0.5)
            assert out[0].shape == xyz.shape
            assert np.isfinite(np.asarray(out[0])).all()
        # empty_voxel grid starts at zeros -> mask 0 -> xyz term suppressed
        cfg = dc.replace(base, empty_voxel=True)
        params = deformation.init_deform(jax.random.key(0), cfg)
        out = deformation.deform_apply(params, cfg, aabb, xyz, scal, rot,
                                       op, shs, 0.5)
        dx_only = out[0]  # = 0*xyz + dx
        assert not np.allclose(np.asarray(dx_only), np.asarray(xyz))


class TestDenseGrid:
    def test_trilinear_midpoint(self):
        from fourdgs_tpu.models import dense_grid
        g = jnp.zeros((2, 2, 2, 1)).at[1, 1, 1, 0].set(8.0)
        out = dense_grid.dense_grid_sample(g, jnp.zeros((1, 3)))
        assert float(out[0, 0]) == pytest.approx(1.0)  # center = mean

    def test_border_clamp(self):
        from fourdgs_tpu.models import dense_grid
        g = jnp.arange(8.0).reshape(2, 2, 2, 1)
        out = dense_grid.dense_grid_sample(g, jnp.array([[5.0, -5.0, 5.0]]))
        assert float(out[0, 0]) == pytest.approx(5.0)  # (x1,y0,z1) idx 5


class TestBilinearVJP:
    def test_custom_vjp_matches_autodiff(self):
        """The fused-scatter custom VJP must equal autodiff of the plain
        formula for plane AND coordinate gradients."""
        def plain(plane, u, v):
            h, w, _ = plane.shape
            x = jnp.clip((u + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
            y = jnp.clip((v + 1.0) * 0.5 * (h - 1), 0.0, h - 1)
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, w - 1)
            y1 = jnp.minimum(y0 + 1, h - 1)
            fx = (x - x0)[:, None]
            fy = (y - y0)[:, None]
            p00, p01 = plane[y0, x0], plane[y0, x1]
            p10, p11 = plane[y1, x0], plane[y1, x1]
            top = p00 * (1 - fx) + p01 * fx
            bot = p10 * (1 - fx) + p11 * fx
            return top * (1 - fy) + bot * fy

        rng = np.random.default_rng(4)
        plane = jnp.asarray(rng.normal(size=(7, 9, 5)).astype(np.float32))
        u = jnp.asarray(rng.uniform(-0.95, 0.95, 40).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.95, 0.95, 40).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(40, 5)).astype(np.float32))

        def loss_a(p, uu, vv):
            return (hexplane.bilinear_sample(p, uu, vv) * cot).sum()

        def loss_b(p, uu, vv):
            return (plain(p, uu, vv) * cot).sum()

        np.testing.assert_allclose(
            np.asarray(hexplane.bilinear_sample(plane, u, v)),
            np.asarray(plain(plane, u, v)), atol=1e-6)
        ga = jax.grad(loss_a, argnums=(0, 1, 2))(plane, u, v)
        gb = jax.grad(loss_b, argnums=(0, 1, 2))(plane, u, v)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
