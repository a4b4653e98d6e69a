"""Unit tests for the math substrate: quaternions, covariance, SH, losses,
schedules, KNN. Hand-computed and property-based cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops import knn, losses, schedule, sh, transforms


class TestQuaternions:
    def test_identity_quat(self):
        R = transforms.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_90deg_z(self):
        # 90 deg about z: q = (cos45, 0, 0, sin45)
        s = np.sqrt(0.5)
        R = transforms.quat_to_rotmat(jnp.array([[s, 0, 0, s]]))[0]
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                                   np.array([0.0, 1, 0]), atol=1e-6)

    def test_unnormalized_input_ok(self):
        q = jnp.array([[2.0, 0, 0, 0]])
        np.testing.assert_allclose(transforms.quat_to_rotmat(q)[0], np.eye(3),
                                   atol=1e-6)

    def test_rotation_orthonormal(self, rng):
        q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        R = transforms.quat_to_rotmat(q)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_quat_multiply_matches_rotmat(self, rng):
        q1 = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        q2 = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        q3 = transforms.quat_multiply(q1, q2)
        R = transforms.quat_to_rotmat(q1) @ transforms.quat_to_rotmat(q2)
        np.testing.assert_allclose(transforms.quat_to_rotmat(q3), R, atol=1e-5)


class TestCovariance:
    def test_axis_aligned(self):
        s = jnp.array([[1.0, 2.0, 3.0]])
        q = jnp.array([[1.0, 0, 0, 0]])
        cov = transforms.build_covariance_3d(s, q)[0]
        np.testing.assert_allclose(cov, np.diag([1.0, 4.0, 9.0]), atol=1e-5)

    def test_strip_roundtrip(self, rng):
        s = jnp.asarray(np.abs(rng.normal(size=(16, 3))).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        cov = transforms.build_covariance_3d(s, q)
        packed = transforms.strip_symmetric(cov)
        np.testing.assert_allclose(transforms.unstrip_symmetric(packed), cov,
                                   atol=1e-6)

    def test_packed_matches_matrix_build(self, rng):
        s = jnp.asarray(np.abs(rng.normal(size=(64, 3))).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
        packed = transforms.build_covariance_packed(s, q, 1.3)
        ref = transforms.strip_symmetric(
            transforms.build_covariance_3d(1.3 * s, q))
        np.testing.assert_allclose(packed, ref, atol=1e-5)

    def test_scale_modifier(self):
        s = jnp.array([[1.0, 1.0, 1.0]])
        q = jnp.array([[1.0, 0, 0, 0]])
        cov = transforms.build_covariance_3d(s, q, scaling_modifier=2.0)[0]
        np.testing.assert_allclose(cov, 4.0 * np.eye(3), atol=1e-5)


class TestCameraMatrices:
    def test_world_to_view_roundtrip(self, rng):
        # random rotation via quaternion
        q = rng.normal(size=4)
        R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q[None]))[0])
        t = rng.normal(size=3)
        W = transforms.world_to_view(R, t)
        # camera center maps to origin
        C = np.linalg.inv(W)[:3, 3]
        p = W @ np.append(C, 1.0)
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)

    def test_projection_center(self):
        P = transforms.projection_matrix(0.01, 100.0, 1.0, 1.0)
        # on-axis point at z=1 projects to ndc (0, 0)
        clip = P @ np.array([0.0, 0, 1, 1])
        np.testing.assert_allclose(clip[:2] / clip[3], 0.0, atol=1e-6)
        assert clip[3] == pytest.approx(1.0)

    def test_projection_edge(self):
        fov = 2 * np.arctan(0.5)  # tanfov = 0.5
        P = transforms.projection_matrix(0.01, 100.0, fov, fov)
        clip = P @ np.array([0.5, 0, 1, 1])  # at frustum edge x
        np.testing.assert_allclose(clip[0] / clip[3], 1.0, atol=1e-6)

    def test_fov_focal_roundtrip(self):
        assert transforms.focal2fov(transforms.fov2focal(0.9, 800), 800) == \
            pytest.approx(0.9)


class TestSH:
    def test_deg0_constant(self):
        coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, sh.C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([0.2, 0.5, 0.9])
        np.testing.assert_allclose(sh.sh_dc_to_rgb(sh.rgb_to_sh(rgb)), rgb,
                                   atol=1e-6)

    def test_deg1_direction_dependence(self):
        coeffs = jnp.zeros((1, 4, 3)).at[0, 2, :].set(1.0)  # z band
        up = jnp.array([[0.0, 0, 1]])
        down = jnp.array([[0.0, 0, -1]])
        v_up = sh.eval_sh(1, coeffs, up)[0, 0]
        v_dn = sh.eval_sh(1, coeffs, down)[0, 0]
        assert v_up == pytest.approx(sh.C1, abs=1e-6)
        assert v_dn == pytest.approx(-sh.C1, abs=1e-6)

    def test_all_degrees_run(self, rng):
        coeffs = jnp.asarray(rng.normal(size=(7, 25, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        vals = [sh.eval_sh(d, coeffs, dirs) for d in range(5)]
        for v in vals:
            assert v.shape == (7, 3)
        # higher degrees add energy
        assert not np.allclose(vals[0], vals[4])


class TestLosses:
    def test_l1_l2(self):
        a = jnp.ones((4, 4, 3))
        b = jnp.zeros((4, 4, 3))
        assert losses.l1_loss(a, b) == pytest.approx(1.0)
        assert losses.l2_loss(2 * a, b) == pytest.approx(4.0)

    def test_psnr_known(self):
        a = jnp.full((1, 8, 8, 3), 0.5)
        b = jnp.full((1, 8, 8, 3), 0.6)
        # mse = 0.01 -> psnr = 20
        np.testing.assert_allclose(losses.psnr(a, b), 20.0, atol=1e-4)

    def test_ssim_identical(self, rng):
        img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_degrades(self, rng):
        img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        noisy = jnp.clip(img + 0.3 * jnp.asarray(
            rng.normal(size=(1, 32, 32, 3)).astype(np.float32)), 0, 1)
        assert float(losses.ssim(img, noisy)) < 0.9

    def test_ssim_matches_torch_impl(self, rng):
        """Cross-check against an independent torch implementation of the
        reference's SSIM (utils/loss_utils.py:36-66)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from math import exp

        img1 = rng.uniform(size=(1, 3, 24, 24)).astype(np.float32)
        img2 = rng.uniform(size=(1, 3, 24, 24)).astype(np.float32)

        g = torch.tensor([exp(-(x - 5) ** 2 / (2 * 1.5 ** 2)) for x in range(11)])
        g = (g / g.sum()).unsqueeze(1)
        win = (g @ g.t()).float().unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
        t1, t2 = torch.from_numpy(img1), torch.from_numpy(img2)
        mu1 = F.conv2d(t1, win, padding=5, groups=3)
        mu2 = F.conv2d(t2, win, padding=5, groups=3)
        s1 = F.conv2d(t1 * t1, win, padding=5, groups=3) - mu1 ** 2
        s2 = F.conv2d(t2 * t2, win, padding=5, groups=3) - mu2 ** 2
        s12 = F.conv2d(t1 * t2, win, padding=5, groups=3) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
               ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean().item()

        ours = float(losses.ssim(jnp.asarray(img1.transpose(0, 2, 3, 1)),
                                 jnp.asarray(img2.transpose(0, 2, 3, 1))))
        assert ours == pytest.approx(ref, abs=1e-5)

    def test_ms_ssim_identical(self, rng):
        img = jnp.asarray(rng.uniform(size=(1, 180, 180, 3)).astype(np.float32))
        np.testing.assert_allclose(losses.ms_ssim(img, img), 1.0, atol=1e-4)


class TestSchedule:
    def test_endpoints(self):
        fn = schedule.make_expon_lr(1e-2, 1e-4, max_steps=100)
        assert float(fn(0)) == pytest.approx(1e-2, rel=1e-5)
        assert float(fn(100)) == pytest.approx(1e-4, rel=1e-5)
        assert float(fn(200)) == pytest.approx(1e-4, rel=1e-5)

    def test_log_linear_midpoint(self):
        fn = schedule.make_expon_lr(1e-2, 1e-4, max_steps=100)
        assert float(fn(50)) == pytest.approx(1e-3, rel=1e-4)

    def test_delay_ramp(self):
        fn = schedule.make_expon_lr(1e-2, 1e-2, lr_delay_steps=10,
                                    lr_delay_mult=0.1, max_steps=100)
        assert float(fn(0)) == pytest.approx(1e-3, rel=1e-4)
        assert float(fn(10)) == pytest.approx(1e-2, rel=1e-4)

    def test_negative_step_disabled(self):
        fn = schedule.make_expon_lr(1e-2, 1e-4, max_steps=100)
        assert float(fn(-1)) == 0.0


class TestKNN:
    def test_unit_grid(self):
        # 2D unit grid embedded in 3D: interior points' 3-NN are all at
        # distance 1 -> mean squared distance 1 (corners see a diagonal).
        xs, ys = np.meshgrid(np.arange(5.0), np.arange(5.0))
        pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(25)], -1)
        d2 = np.asarray(knn.knn_mean_sq_dist(jnp.asarray(pts, jnp.float32), k=3,
                                             chunk=8)).reshape(5, 5)
        np.testing.assert_allclose(d2[1:-1, 1:-1], 1.0, atol=1e-5)
        np.testing.assert_allclose(d2[0, 0], (1 + 1 + 2) / 3, atol=1e-5)

    def test_matches_bruteforce(self, rng):
        pts = rng.normal(size=(101, 3)).astype(np.float32)
        d2 = np.asarray(knn.knn_mean_sq_dist(jnp.asarray(pts), k=3, chunk=32))
        # numpy brute force
        diff = pts[:, None] - pts[None, :]
        dist2 = (diff ** 2).sum(-1)
        np.fill_diagonal(dist2, np.inf)
        ref = np.sort(dist2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(d2, ref, rtol=1e-4, atol=1e-5)

    def test_dist2_init_clamps(self):
        pts = np.zeros((4, 3), np.float32)  # all identical -> d2 = 0
        d2 = np.asarray(knn.dist2_init(pts))
        np.testing.assert_allclose(d2, 1e-7)
