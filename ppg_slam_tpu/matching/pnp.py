"""PnP solver for relocalization (role of the reference MLPnPsolver).

The reference uses a Maximum-Likelihood PnP (bearing-vector nullspace
formulation) inside RANSAC, invoked only from Relocalization
(/root/reference/matching/MLPnPsolver.*, Tracking.cpp:1227). This TPU-native
framework uses an equivalent-capability solver with simpler algebra: EPnP-style
DLT initialization on RANSAC minimal sets + dense Gauss-Newton refinement on
the inliers, with the same RANSAC interface (iterate with inlier thresholds,
refine on success). Relocalization quality gates in the tracking layer are
unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..geometry.cameras import CameraModel


def _dlt_pose(Xw: np.ndarray, uv_n: np.ndarray
              ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """6+ point DLT for [R|t] from world points and normalized image coords,
    followed by orthonormalization."""
    n = len(Xw)
    A = np.zeros((2 * n, 12))
    for i in range(n):
        X = np.append(Xw[i], 1.0)
        A[2 * i, 0:4] = X
        A[2 * i, 8:12] = -uv_n[i, 0] * X
        A[2 * i + 1, 4:8] = X
        A[2 * i + 1, 8:12] = -uv_n[i, 1] * X
    _, _, vt = np.linalg.svd(A)
    P = vt[-1].reshape(3, 4)
    R_raw = P[:, :3]
    # orthonormalize with sign fix (points must be in front)
    u, s, vt2 = np.linalg.svd(R_raw)
    det = np.linalg.det(u @ vt2)
    D = np.diag([1.0, 1.0, np.sign(det)])
    R = u @ D @ vt2
    scale = np.mean(s) * np.sign(det) if det != 0 else np.mean(s)
    if abs(scale) < 1e-12:
        return None
    t = P[:, 3] / scale
    # cheirality: majority of points must have positive depth
    z = Xw @ R[2] + t[2]
    if np.median(z) < 0:
        R = -R if np.linalg.det(-R) > 0 else R
        t = -t
        z = Xw @ R[2] + t[2]
        if np.median(z) < 0:
            return None
    return R.astype(np.float32), t.astype(np.float32)


def _gn_refine(R, t, Xw, uv, fx, fy, cx, cy, iters=8):
    from ..geometry import so3
    import jax.numpy as jnp

    for _ in range(iters):
        Xc = Xw @ R.T + t
        z = np.maximum(Xc[:, 2], 1e-6)
        u = fx * Xc[:, 0] / z + cx
        v = fy * Xc[:, 1] / z + cy
        r = np.stack([uv[:, 0] - u, uv[:, 1] - v], 1).reshape(-1)
        # analytic Jacobian wrt [w, t] (left perturbation on Tcw)
        n = len(Xw)
        J = np.zeros((2 * n, 6))
        invz = 1.0 / z
        invz2 = invz * invz
        x, y = Xc[:, 0], Xc[:, 1]
        # d(uv)/dXc
        J_u = np.stack([fx * invz, np.zeros(n), -fx * x * invz2], 1)
        J_v = np.stack([np.zeros(n), fy * invz, -fy * y * invz2], 1)
        # dXc/d(w) = -[Xc]x ; dXc/dt = I
        for i in range(n):
            skew = np.array([[0, -Xc[i, 2], Xc[i, 1]],
                             [Xc[i, 2], 0, -Xc[i, 0]],
                             [-Xc[i, 1], Xc[i, 0], 0]])
            J[2 * i, :3] = -(J_u[i] @ (-skew))
            J[2 * i, 3:] = -(J_u[i])
            J[2 * i + 1, :3] = -(J_v[i] @ (-skew))
            J[2 * i + 1, 3:] = -(J_v[i])
        H = J.T @ J + 1e-6 * np.eye(6)
        g = J.T @ r
        dx = -np.linalg.solve(H, g)
        dR = np.asarray(so3.exp(jnp.asarray(dx[:3].astype(np.float32))))
        R = (dR @ R).astype(np.float32)
        t = (dR @ t + dx[3:]).astype(np.float32)
    return R, t


class PnPSolver:
    """RANSAC PnP with the MLPnPsolver interface used by relocalization."""

    def __init__(self, Xw: np.ndarray, uv: np.ndarray, cam: CameraModel,
                 probability=0.99, min_inliers=10, max_iterations=300,
                 min_set=6, epsilon=0.4, th2=5.991, seed: int = 0):
        self.Xw = np.asarray(Xw, np.float32)
        self.uv = np.asarray(uv, np.float32)
        self.cam = cam
        self.n = len(Xw)
        self.min_set = min_set
        self.min_inliers = max(min_inliers, min_set)
        self.th2 = th2
        self.rng = np.random.RandomState(seed)
        eps = max(epsilon, self.min_inliers / max(self.n, 1))
        if self.n >= self.min_inliers:
            its = int(np.ceil(np.log(max(1 - probability, 1e-12))
                              / np.log(max(1 - eps ** min_set, 1e-12))))
            self.max_iterations = int(np.clip(its, 1, max_iterations))
        else:
            self.max_iterations = 1
        self.iterations_done = 0
        self.best_inliers = np.zeros(self.n, bool)
        self.best_n = 0
        self.best_R = None
        self.best_t = None
        # normalized coords for the DLT
        self._uv_n = np.stack([
            (self.uv[:, 0] - cam.cx) / cam.fx,
            (self.uv[:, 1] - cam.cy) / cam.fy,
        ], 1)

    def _inliers(self, R, t) -> np.ndarray:
        Xc = self.Xw @ R.T + t
        ok = Xc[:, 2] > 0
        z = np.where(ok, Xc[:, 2], 1.0)
        u = self.cam.fx * Xc[:, 0] / z + self.cam.cx
        v = self.cam.fy * Xc[:, 1] / z + self.cam.cy
        e2 = (u - self.uv[:, 0]) ** 2 + (v - self.uv[:, 1]) ** 2
        return ok & (e2 < self.th2)

    def iterate(self, n_iterations: int):
        """Returns (ok, Rcw, tcw, inliers, n_inliers, no_more)."""
        if self.n < self.min_set:
            return False, None, None, np.zeros(self.n, bool), 0, True
        it = 0
        while it < n_iterations and \
                self.iterations_done < self.max_iterations:
            it += 1
            self.iterations_done += 1
            idx = self.rng.choice(self.n, self.min_set, replace=False)
            res = _dlt_pose(self.Xw[idx], self._uv_n[idx])
            if res is None:
                continue
            R, t = res
            inl = self._inliers(R, t)
            n_in = int(inl.sum())
            if n_in > self.best_n:
                self.best_n = n_in
                self.best_inliers = inl
                self.best_R, self.best_t = R, t
            if n_in >= self.min_inliers:
                # refine on inliers
                R2, t2 = _gn_refine(R, t, self.Xw[inl], self.uv[inl],
                                    self.cam.fx, self.cam.fy, self.cam.cx,
                                    self.cam.cy)
                inl2 = self._inliers(R2, t2)
                if inl2.sum() >= self.min_inliers:
                    self.best_R, self.best_t = R2, t2
                    self.best_inliers = inl2
                    self.best_n = int(inl2.sum())
                    return (True, R2, t2, inl2, self.best_n,
                            self.iterations_done >= self.max_iterations)
        no_more = self.iterations_done >= self.max_iterations
        return False, self.best_R, self.best_t, self.best_inliers, \
            self.best_n, no_more
