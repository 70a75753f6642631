"""Unit tests for the geometry/SH/loss core against closed forms."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from unipre3d_tpu.utils import camera, losses, sh


class TestCamera:
    def test_world2view_roundtrip(self):
        rng = np.random.default_rng(0)
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        R = q * np.sign(np.linalg.det(q))
        t = rng.normal(size=3)
        w2v = camera.get_world2view(R, t)
        v2w = camera.get_view2world(R, t)
        np.testing.assert_allclose(w2v @ v2w, np.eye(4), atol=1e-5)

    def test_projection_depth_range(self):
        znear, zfar = 0.5, 2.0
        fov = math.radians(49.134)
        P = camera.get_projection_matrix(znear, zfar, fov, fov)
        for z, expect in [(znear, 0.0), (zfar, 1.0)]:
            p = P @ np.array([0.0, 0.0, z, 1.0])
            assert abs(p[2] / p[3] - expect) < 1e-6
        # point on the frustum edge maps to ndc x = 1
        x_edge = math.tan(fov / 2) * znear
        p = P @ np.array([x_edge, 0.0, znear, 1.0])
        assert abs(p[0] / p[3] - 1.0) < 1e-6

    def test_build_camera_tensors_consistency(self):
        rng = np.random.default_rng(1)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        R = q * np.sign(np.linalg.det(q))
        t = rng.normal(size=3)
        fov = math.radians(50.0)
        cams = camera.build_camera_tensors(R, t, fov, fov, 0.5, 2.0)
        # row-vector convention: full_proj = world_view @ proj
        wv = cams["world_view_transform"]
        fp = cams["full_proj_transform"]
        P = camera.get_projection_matrix(0.5, 2.0, fov, fov).T
        np.testing.assert_allclose(fp, wv @ P, rtol=1e-5, atol=1e-5)
        # camera center maps to origin in view space
        c = np.concatenate([cams["camera_center"], [1.0]])
        view = c @ wv
        np.testing.assert_allclose(view[:3], 0.0, atol=1e-4)

    def test_quat_to_rotmat_identity_and_orthonormal(self):
        np.testing.assert_allclose(
            camera.quat_to_rotmat(jnp.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-6)
        # 90 deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
        s = math.sqrt(0.5)
        Rz = camera.quat_to_rotmat(jnp.array([s, 0.0, 0.0, s]))
        np.testing.assert_allclose(
            np.asarray(Rz) @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
        rng = np.random.default_rng(2)
        q = camera.normalize_quat(jnp.asarray(rng.normal(size=(5, 4))))
        R = np.asarray(camera.quat_to_rotmat(q))
        for i in range(5):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)

    def test_intrinsics_from_fov(self):
        K = camera.intrinsics_from_fov(90.0, 128)
        assert abs(K[0, 0] - 64.0) < 1e-4  # focal = (res/2)/tan(45deg)
        assert K[0, 2] == 64.0 and K[2, 2] == 1.0


class TestSH:
    def test_degree0_constant(self):
        shc = jnp.zeros((4, 1, 3)).at[:, 0, :].set(1.0)  # [N, K, C=3]
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
        rgb = sh.eval_sh(0, jnp.swapaxes(shc, -1, -2), dirs)
        np.testing.assert_allclose(rgb, sh.C0, rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(np.random.default_rng(1).uniform(size=(10, 3)))
        np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, atol=1e-6)

    def test_degree1_linearity(self):
        # coefficient on basis 3 (-C1 * x): color = C0*dc - C1*x*c3
        K = 4
        shc = np.zeros((1, K, 3), dtype=np.float32)
        shc[0, 0] = 0.7
        shc[0, 3] = 0.2
        d = np.array([[0.6, 0.0, 0.8]], dtype=np.float32)
        out = sh.eval_sh(1, jnp.swapaxes(jnp.asarray(shc), -1, -2), jnp.asarray(d))
        expect = sh.C0 * 0.7 - sh.C1 * 0.6 * 0.2
        np.testing.assert_allclose(out[0], expect, rtol=1e-5)

    def test_clamped_rgb_nonnegative(self):
        rng = np.random.default_rng(3)
        shc = jnp.asarray(rng.normal(size=(32, 4, 3)) * 3)
        dirs = jnp.asarray(rng.normal(size=(32, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb = sh.sh_to_rgb_clamped(1, shc, dirs)
        assert (np.asarray(rgb) >= 0).all()


class TestLosses:
    def test_l1_l2(self):
        a = jnp.ones((2, 3, 4, 4))
        b = jnp.zeros((2, 3, 4, 4))
        assert float(losses.l1_loss(a, b)) == pytest.approx(1.0)
        assert float(losses.l2_loss(a * 2, b)) == pytest.approx(4.0)

    def test_focal_l2_weights(self):
        # image half bg, half fg; bg weight 1, fg weight 4
        bg_color = (0.0, 0.0, 0.0)
        gt = np.zeros((1, 3, 2, 2), dtype=np.float32)
        gt[0, :, 0, :] = 0.5  # fg rows
        pred = gt + 1.0  # error 1 everywhere
        loss = float(losses.focal_l2_loss(
            jnp.asarray(pred), jnp.asarray(gt), bg_color, 4, 1))
        # normalized weights: fg 8/5, bg 2/5, mean = (8/5 + 2/5)/2 = 1
        assert loss == pytest.approx(1.0, rel=1e-5)

    def test_ssim_identical_is_one(self):
        img = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 3, 32, 32)).astype(np.float32))
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        noisy = img + jnp.asarray(rng.normal(size=img.shape).astype(np.float32)) * 0.2
        assert float(losses.ssim(img, noisy)) < 0.9

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        assert float(losses.psnr(a, b)) == pytest.approx(20.0, rel=1e-4)
