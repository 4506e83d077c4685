"""Camera models: Pinhole (+radtan undistortion) and Kannala-Brandt-8 fisheye.

Functional equivalents of /root/reference/sensors/src/{Pinhole,KannalaBrandt8}.cpp
(themselves ORB-SLAM3 ports). All projection math is batched over leading axes
so it runs vectorized on the VPU/MXU; undistortion Newton iterations use
`lax.fori_loop` with fixed trip counts (static shapes for XLA).

Conventions (mirroring the reference):
  * Pinhole `project` is distortion-free (keypoints are undistorted once in the
    extractor, Pinhole.cpp:25-38); radtan distortion appears only in
    `pinhole_distort` / `pinhole_undistort` (cv::undistortPoints equivalent).
  * KB8 `project` applies the full equidistant model (KannalaBrandt8.cpp:27-60)
    because fisheye keypoints keep their distorted positions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CAM_PINHOLE = 0
CAM_FISHEYE = 1

# Feature-grid constants (reference GeometricCamera.h:42-97: 64x48 cell grid)
GRID_COLS = 64
GRID_ROWS = 48


@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Static camera description (hashable -> usable as a jit static arg)."""

    kind: int  # CAM_PINHOLE | CAM_FISHEYE
    fx: float
    fy: float
    cx: float
    cy: float
    # distortion: radtan (k1,k2,p1,p2) for pinhole; (k1..k4) theta-poly for KB8
    dist: Tuple[float, float, float, float]
    width: int
    height: int
    fps: float = 20.0

    # -- matrices ---------------------------------------------------------
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    @property
    def is_fisheye(self) -> bool:
        return self.kind == CAM_FISHEYE

    # -- core ops (jax, batched) -------------------------------------------
    def project(self, xyz: jax.Array) -> jax.Array:
        """(..., 3) camera-frame points -> (..., 2) pixels."""
        if self.kind == CAM_PINHOLE:
            z = xyz[..., 2]
            return jnp.stack(
                [
                    self.fx * xyz[..., 0] / z + self.cx,
                    self.fy * xyz[..., 1] / z + self.cy,
                ],
                axis=-1,
            )
        return kb8_project(xyz, self.fx, self.fy, self.cx, self.cy, self.dist)

    def unproject(self, uv: jax.Array) -> jax.Array:
        """(..., 2) pixels -> (..., 3) unit-depth bearing (z = 1).

        Pinhole: inverse K on (already-undistorted) pixels (Pinhole.cpp:40-43).
        KB8: Newton inversion of the theta polynomial (KannalaBrandt8.cpp:62-91).
        """
        if self.kind == CAM_PINHOLE:
            x = (uv[..., 0] - self.cx) / self.fx
            y = (uv[..., 1] - self.cy) / self.fy
            return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return kb8_unproject(uv, self.fx, self.fy, self.cx, self.cy, self.dist)

    # -- numpy twins (host bookkeeping paths) --------------------------------
    # Per-frame host code (frustum checks, projection matching, incremental
    # triangulation) calls these thousands of times on small variable-shape
    # arrays; eager jnp dispatch costs ~2 ms/call there while numpy is ~us.
    def project_np(self, xyz: np.ndarray) -> np.ndarray:
        """(..., 3) camera-frame points -> (..., 2) pixels (numpy)."""
        xyz = np.asarray(xyz, np.float32)
        if self.kind == CAM_PINHOLE:
            z = xyz[..., 2]
            return np.stack([
                self.fx * xyz[..., 0] / z + self.cx,
                self.fy * xyz[..., 1] / z + self.cy,
            ], axis=-1)
        k1, k2, k3, k4 = self.dist
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        r = np.sqrt(x * x + y * y)
        theta = np.arctan2(r, z)
        t2 = theta * theta
        rad = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        rs = np.where(r > 1e-12, r, 1.0)
        return np.stack([self.fx * rad * x / rs + self.cx,
                         self.fy * rad * y / rs + self.cy], axis=-1)

    def unproject_np(self, uv: np.ndarray) -> np.ndarray:
        """(..., 2) pixels -> (..., 3) unit-depth bearings (numpy)."""
        uv = np.asarray(uv, np.float32)
        px = (uv[..., 0] - self.cx) / self.fx
        py = (uv[..., 1] - self.cy) / self.fy
        if self.kind == CAM_PINHOLE:
            return np.stack([px, py, np.ones_like(px)], axis=-1)
        k1, k2, k3, k4 = self.dist
        theta_d = np.sqrt(px * px + py * py)
        theta = np.clip(theta_d, -np.pi / 2, np.pi / 2)
        for _ in range(10):
            t2 = theta * theta
            t4 = t2 * t2
            t6 = t4 * t2
            t8 = t4 * t4
            num = theta * (1 + k1 * t2 + k2 * t4 + k3 * t6 + k4 * t8) - \
                np.clip(theta_d, -np.pi / 2, np.pi / 2)
            den = 1 + 3 * k1 * t2 + 5 * k2 * t4 + 7 * k3 * t6 + 9 * k4 * t8
            theta = theta - num / den
        scale = np.where(theta_d > 1e-8,
                         np.tan(theta) / np.where(theta_d > 1e-8, theta_d, 1.0),
                         1.0)
        return np.stack([px * scale, py * scale, np.ones_like(px)], axis=-1)

    def project_jac(self, xyz: jax.Array) -> jax.Array:
        """(..., 3) -> (..., 2, 3) d(uv)/d(xyz) (analytic, matches reference)."""
        if self.kind == CAM_PINHOLE:
            x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
            zi = 1.0 / z
            zi2 = zi * zi
            zero = jnp.zeros_like(z)
            row0 = jnp.stack([self.fx * zi, zero, -self.fx * x * zi2], axis=-1)
            row1 = jnp.stack([zero, self.fy * zi, -self.fy * y * zi2], axis=-1)
            return jnp.stack([row0, row1], axis=-2)
        return kb8_project_jac(xyz, self.fx, self.fy, self.cx, self.cy, self.dist)

    def undistort_points(self, uv: jax.Array) -> jax.Array:
        """Distorted pixels -> undistorted pixels under the same K.

        Equivalent of cv::(fisheye::)undistortPoints(..., K, D, I, K) used in
        the extractor (PPGExtractor.cpp:208-233).
        """
        if self.kind == CAM_PINHOLE:
            return pinhole_undistort(
                uv, self.fx, self.fy, self.cx, self.cy, self.dist
            )
        b = kb8_unproject(uv, self.fx, self.fy, self.cx, self.cy, self.dist)
        return jnp.stack(
            [
                self.fx * b[..., 0] + self.cx,
                self.fy * b[..., 1] + self.cy,
            ],
            axis=-1,
        )

    def distort_points(self, uv: jax.Array) -> jax.Array:
        """Undistorted pixels -> distorted pixels (closed form, no iteration).

        Equivalent of the forward mapping inside cv::initUndistortRectifyMap
        used for heatmap remap (PPGExtractor.cpp:64-71, :258-263).
        """
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        if self.kind == CAM_PINHOLE:
            k1, k2, p1, p2 = self.dist
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        else:
            k1, k2, k3, k4 = self.dist
            r = jnp.sqrt(x * x + y * y)
            theta = jnp.arctan(r)
            t2 = theta * theta
            theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
            scale = jnp.where(r > 1e-8, theta_d / jnp.where(r > 1e-8, r, 1.0), 1.0)
            xd, yd = x * scale, y * scale
        return jnp.stack(
            [self.fx * xd + self.cx, self.fy * yd + self.cy], axis=-1
        )

    def undistort_rectify_map(self) -> np.ndarray:
        """Precomputed (H, W, 2) map: undistorted pixel -> distorted source pixel
        (float32), for bilinear remap of the line heatmap."""
        u = np.arange(self.width, dtype=np.float32)
        v = np.arange(self.height, dtype=np.float32)
        uu, vv = np.meshgrid(u, v)
        grid = jnp.asarray(np.stack([uu, vv], axis=-1))
        return np.asarray(jax.jit(self.distort_points)(grid))

    def is_in_image(self, uv: jax.Array, border: float = 0.0) -> jax.Array:
        """(..., 2) -> (...,) bool (reference GeometricCamera::IsInImage)."""
        return (
            (uv[..., 0] >= border)
            & (uv[..., 0] < self.width - border)
            & (uv[..., 1] >= border)
            & (uv[..., 1] < self.height - border)
        )


def _cam_leaf(x):
    """Intrinsic -> strongly-typed f32 leaf (Python floats would become
    weak f64 under the tests' x64 mode and fork compiled programs).
    Non-numeric leaves (tracers, jax-internal ArgInfo placeholders during
    lower()/cost_analysis round-trips) pass through untouched."""
    if isinstance(x, (int, float, np.floating, np.integer)):
        return np.float32(x)
    return x


# CameraModel is ALSO a pytree: intrinsics (fx, fy, cx, cy, dist) are runtime
# leaves; (kind, width, height, fps) stay static aux data (kind selects the
# projection code path, width/height feed host-side shapes). This lets the
# solvers take the camera as a DYNAMIC jit argument, so problems that differ
# only in calibration share one compiled program — each distinct camera
# otherwise forks a ~12 s solve_ba compile via static_argnames. Passing a
# CameraModel through static_argnames elsewhere still works (hash/eq are
# untouched).
jax.tree_util.register_pytree_node(
    CameraModel,
    lambda c: ((_cam_leaf(c.fx), _cam_leaf(c.fy), _cam_leaf(c.cx),
                _cam_leaf(c.cy), tuple(_cam_leaf(d) for d in c.dist)),
               (c.kind, c.width, c.height, c.fps)),
    lambda aux, leaves: CameraModel(
        kind=aux[0], fx=leaves[0], fy=leaves[1], cx=leaves[2], cy=leaves[3],
        dist=leaves[4], width=aux[1], height=aux[2], fps=aux[3]),
)


# ----------------------------------------------------------------------------
# pinhole radtan
# ----------------------------------------------------------------------------

def pinhole_undistort(uv, fx, fy, cx, cy, dist, iters: int = 5):
    """Iterative radtan undistortion (cv::undistortPoints semantics).

    OpenCV runs exactly 5 compensation iterations with no convergence check;
    the reference's keypoints carry that exact approximation, so iters=5 is
    the parity choice (10+ converges to the true inverse, up to 0.55 px away
    at the image edges).
    """
    k1, k2, p1, p2 = dist
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + k1 * r2 + k2 * r2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return ((xd - dx) * icdist, (yd - dy) * icdist)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([fx * x + cx, fy * y + cy], axis=-1)


# ----------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant fisheye)
# ----------------------------------------------------------------------------

def kb8_project(xyz, fx, fy, cx, cy, dist):
    k1, k2, k3, k4 = dist
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    rad = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    # cos(psi) = x/r, sin(psi) = y/r with safe r
    rs = jnp.where(r > 1e-12, r, 1.0)
    return jnp.stack(
        [fx * rad * x / rs + cx, fy * rad * y / rs + cy], axis=-1
    )


def kb8_unproject(uv, fx, fy, cx, cy, dist, iters: int = 10):
    """Newton inversion of theta_d = f(theta) (KannalaBrandt8.cpp:62-91)."""
    k1, k2, k3, k4 = dist
    px = (uv[..., 0] - cx) / fx
    py = (uv[..., 1] - cy) / fy
    theta_d = jnp.sqrt(px * px + py * py)
    theta_d_c = jnp.clip(theta_d, -np.pi / 2, np.pi / 2)

    def body(_, theta):
        t2 = theta * theta
        t4 = t2 * t2
        t6 = t4 * t2
        t8 = t4 * t4
        num = theta * (1 + k1 * t2 + k2 * t4 + k3 * t6 + k4 * t8) - theta_d_c
        den = 1 + 3 * k1 * t2 + 5 * k2 * t4 + 7 * k3 * t6 + 9 * k4 * t8
        return theta - num / den

    theta = jax.lax.fori_loop(0, iters, body, theta_d_c)
    scale = jnp.where(
        theta_d > 1e-8, jnp.tan(theta) / jnp.where(theta_d > 1e-8, theta_d, 1.0), 1.0
    )
    return jnp.stack([px * scale, py * scale, jnp.ones_like(px)], axis=-1)


def kb8_project_jac(xyz, fx, fy, cx, cy, dist):
    """Analytic 2x3 Jacobian (KannalaBrandt8.cpp:95-131)."""
    k1, k2, k3, k4 = dist
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    r2 = x2 + y2
    r = jnp.sqrt(r2)
    r3 = r2 * r
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    t4 = t2 * t2
    t6 = t4 * t2
    t8 = t4 * t4
    f = theta * (1 + k1 * t2 + k2 * t4 + k3 * t6 + k4 * t8)
    fd = 1 + 3 * k1 * t2 + 5 * k2 * t4 + 7 * k3 * t6 + 9 * k4 * t8
    denom = r2 * (r2 + z2)
    j00 = fx * (fd * z * x2 / denom + f * y2 / r3)
    j01 = fx * (fd * z * y * x / denom - f * y * x / r3)
    j02 = -fx * fd * x / (r2 + z2)
    j10 = fy * (fd * z * y * x / denom - f * y * x / r3)
    j11 = fy * (fd * z * y2 / denom + f * x2 / r3)
    j12 = -fy * fd * y / (r2 + z2)
    row0 = jnp.stack([j00, j01, j02], axis=-1)
    row1 = jnp.stack([j10, j11, j12], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def epipolar_sq_dist(kp1_uv, kp2_uv, R12, t12, K):
    """Squared point-to-epipolar-line distance (Pinhole.cpp:101-121).

    kp*_uv: (..., 2); returns (...,) squared pixel distance; threshold 3.84.
    """
    from . import so3

    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ so3.hat(t12) @ R12 @ Kinv
    a = kp1_uv[..., 0] * F12[0, 0] + kp1_uv[..., 1] * F12[1, 0] + F12[2, 0]
    b = kp1_uv[..., 0] * F12[0, 1] + kp1_uv[..., 1] * F12[1, 1] + F12[2, 1]
    c = kp1_uv[..., 0] * F12[0, 2] + kp1_uv[..., 1] * F12[1, 2] + F12[2, 2]
    num = a * kp2_uv[..., 0] + b * kp2_uv[..., 1] + c
    den = a * a + b * b
    return jnp.where(den > 0, num * num / jnp.where(den > 0, den, 1.0), jnp.inf)
