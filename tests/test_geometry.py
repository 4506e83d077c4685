"""Unit tests for SO3/SE3/Sim3 and camera models (SURVEY.md §4 test pyramid)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax
import jax.numpy as jnp

from ppg_slam_tpu.geometry import SE3, Sim3, so3
from ppg_slam_tpu.geometry.cameras import (
    CAM_FISHEYE,
    CAM_PINHOLE,
    CameraModel,
)

RNG = np.random.RandomState(0)


def rand_w(n, scale=2.0):
    return RNG.randn(n, 3).astype(np.float32) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rand_w(64)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        R_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = rand_w(64, scale=1.0)
        # log returns the canonical |w| < pi representative, so clamp inputs.
        n = np.linalg.norm(w, axis=1, keepdims=True)
        w = np.where(n > 3.0, w * 3.0 / n, w)
        w2 = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_log_small_angle(self):
        w = rand_w(16, scale=1e-7)
        R = so3.exp(jnp.asarray(w))
        w2 = np.asarray(so3.log(R))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_log_near_pi(self):
        axes = RNG.randn(16, 3)
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        w = (axes * (np.pi - 1e-4)).astype(np.float64)
        R = ScipyRot.from_rotvec(w).as_matrix()
        w2 = np.array(so3.log(jnp.asarray(R)))  # np.array: scipy needs writable
        R2 = ScipyRot.from_rotvec(w2).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_right_jacobian_fd(self):
        """Jr: exp(w + dw) ≈ exp(w) exp(Jr(w) dw)."""
        w = rand_w(8, scale=1.5).astype(np.float64)
        Jr = np.asarray(so3.right_jacobian(jnp.asarray(w)))
        eps = 1e-6
        for k in range(3):
            dw = np.zeros(3)
            dw[k] = eps
            lhs = ScipyRot.from_rotvec(w + dw).as_matrix()
            rhs = np.einsum(
                "nij,njk->nik",
                ScipyRot.from_rotvec(w).as_matrix(),
                ScipyRot.from_rotvec(Jr @ dw).as_matrix(),
            )
            np.testing.assert_allclose(lhs, rhs, atol=1e-9)

    def test_inverse_right_jacobian(self):
        w = rand_w(16, scale=1.5)
        Jr = so3.right_jacobian(jnp.asarray(w))
        Jri = so3.inverse_right_jacobian(jnp.asarray(w))
        prod = np.asarray(Jr @ Jri)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4
        )

    def test_quat_roundtrip(self):
        w = rand_w(64)
        R = so3.exp(jnp.asarray(w))
        q = so3.matrix_to_quat(R)
        R2 = np.asarray(so3.quat_to_matrix(q))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)

    def test_normalize(self):
        w = rand_w(8)
        R = np.asarray(so3.exp(jnp.asarray(w))) + RNG.randn(8, 3, 3) * 1e-3
        Rn = np.asarray(so3.normalize(jnp.asarray(R.astype(np.float32))))
        eye = np.einsum("nij,nkj->nik", Rn, Rn)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        assert np.all(np.linalg.det(Rn) > 0.99)


class TestSE3:
    def test_compose_apply_inverse(self):
        w = rand_w(8, 1.0)
        t = RNG.randn(8, 3).astype(np.float32)
        T = SE3(so3.exp(jnp.asarray(w)), jnp.asarray(t))
        x = jnp.asarray(RNG.randn(8, 3).astype(np.float32))
        y = T.apply(x)
        x2 = T.inverse().apply(y)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
        TT = T @ T.inverse()
        np.testing.assert_allclose(
            np.asarray(TT.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(TT.t), np.zeros((8, 3)), atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = RNG.randn(16, 6).astype(np.float32)
        T = SE3.exp(jnp.asarray(xi))
        xi2 = np.asarray(T.log())
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_matrix_roundtrip(self):
        xi = RNG.randn(4, 6).astype(np.float32)
        T = SE3.exp(jnp.asarray(xi))
        T2 = SE3.from_matrix(T.matrix())
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-7)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = np.concatenate(
            [RNG.randn(16, 6), RNG.randn(16, 1) * 0.5], axis=1
        ).astype(np.float32)
        n = np.linalg.norm(xi[:, 3:6], axis=1, keepdims=True)
        xi[:, 3:6] = np.where(n > 3.0, xi[:, 3:6] * 3.0 / n, xi[:, 3:6])
        S = Sim3.exp(jnp.asarray(xi))
        xi2 = np.asarray(S.log())
        np.testing.assert_allclose(xi2, xi, atol=2e-4)

    def test_compose_inverse(self):
        xi = np.concatenate(
            [RNG.randn(8, 6), RNG.randn(8, 1) * 0.5], axis=1
        ).astype(np.float32)
        S = Sim3.exp(jnp.asarray(xi))
        SS = S @ S.inverse()
        np.testing.assert_allclose(
            np.asarray(SS.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(SS.s), np.ones(8), atol=1e-5)

    def test_apply(self):
        xi = jnp.asarray(
            np.concatenate([RNG.randn(1, 6), [[0.3]]], axis=1).astype(np.float32)
        )
        S = Sim3.exp(xi)
        x = jnp.asarray(RNG.randn(1, 3).astype(np.float32))
        y = np.asarray(S.apply(x))
        y_ref = (
            np.asarray(S.s)[:, None] * np.einsum("nij,nj->ni", np.asarray(S.R), np.asarray(x))
            + np.asarray(S.t)
        )
        np.testing.assert_allclose(y, y_ref, atol=1e-6)


EUROC_CAM = CameraModel(
    kind=CAM_PINHOLE,
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
    width=752, height=480,
)
TUMVI_CAM = CameraModel(
    kind=CAM_FISHEYE,
    fx=190.97847715128717, fy=190.9733070521226,
    cx=254.93170605935475, cy=256.8974428996504,
    dist=(0.0034823894022493434, 0.0007150348452162257,
          -0.0020532361418706202, 0.00020293673591811182),
    width=512, height=512,
)


class TestCameras:
    def test_pinhole_project_unproject(self):
        xyz = RNG.randn(128, 3).astype(np.float32)
        xyz[:, 2] = np.abs(xyz[:, 2]) + 1.0
        uv = EUROC_CAM.project(jnp.asarray(xyz))
        b = np.asarray(EUROC_CAM.unproject(uv))
        np.testing.assert_allclose(
            b[:, :2], xyz[:, :2] / xyz[:, 2:3], atol=1e-5
        )

    def test_pinhole_undistort_vs_opencv(self):
        cv2 = pytest.importorskip("cv2")
        uv = np.stack(
            [RNG.uniform(50, 700, 200), RNG.uniform(50, 430, 200)], axis=1
        ).astype(np.float32)
        ours = np.asarray(EUROC_CAM.undistort_points(jnp.asarray(uv)))
        K = EUROC_CAM.K()
        D = np.array(EUROC_CAM.dist, dtype=np.float32)
        ref = cv2.undistortPoints(
            uv.reshape(-1, 1, 2), K, D, None, K
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=5e-2)  # sub-0.05px

    def test_pinhole_distort_vs_opencv_rectify_map(self):
        cv2 = pytest.importorskip("cv2")
        K = EUROC_CAM.K()
        D = np.array(EUROC_CAM.dist, dtype=np.float32)
        mx, my = cv2.initUndistortRectifyMap(
            K, D, np.eye(3, dtype=np.float32), K,
            (EUROC_CAM.width, EUROC_CAM.height), cv2.CV_32FC1,
        )
        m = EUROC_CAM.undistort_rectify_map()
        np.testing.assert_allclose(m[..., 0], mx, atol=2e-2)
        np.testing.assert_allclose(m[..., 1], my, atol=2e-2)

    def test_kb8_project_unproject(self):
        xyz = RNG.randn(128, 3).astype(np.float32)
        xyz[:, 2] = np.abs(xyz[:, 2]) + 0.5
        uv = TUMVI_CAM.project(jnp.asarray(xyz))
        b = np.asarray(TUMVI_CAM.unproject(uv))
        np.testing.assert_allclose(b[:, :2], xyz[:, :2] / xyz[:, 2:3], atol=1e-3)

    def test_kb8_undistort_vs_opencv(self):
        cv2 = pytest.importorskip("cv2")
        uv = np.stack(
            [RNG.uniform(100, 400, 200), RNG.uniform(100, 400, 200)], axis=1
        ).astype(np.float32)
        ours = np.asarray(TUMVI_CAM.undistort_points(jnp.asarray(uv)))
        K = TUMVI_CAM.K()
        D = np.array(TUMVI_CAM.dist, dtype=np.float32)
        ref = cv2.fisheye.undistortPoints(
            uv.reshape(1, -1, 2), K, D, None, K
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=5e-2)

    def test_project_jac_fd(self):
        for cam in (EUROC_CAM, TUMVI_CAM):
            xyz = RNG.randn(32, 3).astype(np.float64)
            xyz[:, 2] = np.abs(xyz[:, 2]) + 1.0
            J = np.asarray(cam.project_jac(jnp.asarray(xyz)))
            eps = 1e-6
            for k in range(3):
                d = np.zeros(3)
                d[k] = eps
                fd = (
                    np.asarray(cam.project(jnp.asarray(xyz + d)))
                    - np.asarray(cam.project(jnp.asarray(xyz - d)))
                ) / (2 * eps)
                np.testing.assert_allclose(J[:, :, k], fd, atol=1e-3, rtol=1e-3)
