"""Sim3Solver: RANSAC + Horn closed-form similarity between two keyframes.

Mirror of /root/reference/matching/Sim3Solver.* (ORB-SLAM3 port): given
matched MapPoints of two KFs (expressed in each camera frame), find the
relative Sim3 (optionally fixed scale) with Horn's 1987 quaternion method on
random 3-point sets, scoring by reprojection error in both images
(th2 = 9.210 px^2 per point in the reference).

All RANSAC hypotheses are computed and scored in one vectorized pass (the
TPU-friendly shape); iterate() keeps the reference's incremental API for the
loop-closing protocol.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..geometry.cameras import CameraModel


def horn_sim3(P1: np.ndarray, P2: np.ndarray, fix_scale: bool = False
              ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Closed-form Sim3 aligning P2 -> P1 (3xN each): returns (R12, t12, s12).

    Horn, 'Closed-form solution of absolute orientation using unit
    quaternions' (Sim3Solver::ComputeSim3, Sim3Solver.cpp)."""
    c1 = P1.mean(axis=1, keepdims=True)
    c2 = P2.mean(axis=1, keepdims=True)
    Pr1 = P1 - c1
    Pr2 = P2 - c2
    M = Pr2 @ Pr1.T  # note: maps 2 into 1
    Sxx, Sxy, Sxz = M[0]
    Syx, Syy, Syz = M[1]
    Szx, Szy, Szz = M[2]
    N = np.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
    ])
    w, v = np.linalg.eigh(N)
    q = v[:, -1]  # (w, x, y, z)
    qw, qx, qy, qz = q
    R = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ])
    if fix_scale:
        s = 1.0
    else:
        # ORB-SLAM3: s = trace(Pr1^T R Pr2) / |Pr2|^2
        num = float(np.sum(Pr1 * (R @ Pr2)))
        den = float(np.sum(Pr2 * Pr2))
        s = num / max(den, 1e-12)
    t = (c1 - s * R @ c2)[:, 0]
    return R.astype(np.float32), t.astype(np.float32), float(s)


class Sim3Solver:
    def __init__(self, X1: np.ndarray, X2: np.ndarray,
                 uv1: np.ndarray, uv2: np.ndarray,
                 cam: CameraModel, fix_scale: bool,
                 probability: float = 0.99, min_inliers: int = 6,
                 max_iterations: int = 300, seed: int = 0):
        """X1/X2: (N, 3) matched points in camera-1 / camera-2 frames;
        uv1/uv2: their pixel observations in image 1 / image 2."""
        self.X1 = np.asarray(X1, np.float32)
        self.X2 = np.asarray(X2, np.float32)
        self.uv1 = np.asarray(uv1, np.float32)
        self.uv2 = np.asarray(uv2, np.float32)
        self.cam = cam
        self.fix_scale = fix_scale
        self.n = len(X1)
        self.max_error = 9.210  # Sim3Solver.cpp mvnMaxError (chi2 2dof 99%)
        self.min_inliers = min_inliers
        self.rng = np.random.RandomState(seed)
        self.iterations_done = 0
        # adaptive iteration count like SetRansacParameters
        eps = min_inliers / max(self.n, 1)
        if self.n >= min_inliers and eps > 0:
            n_iter = int(np.ceil(np.log(1 - probability)
                                 / np.log(max(1 - eps ** 3, 1e-9))))
            self.max_iterations = int(np.clip(n_iter, 1, max_iterations))
        else:
            self.max_iterations = 1
        self.best_inliers = np.zeros(self.n, bool)
        self.best_n = 0
        self.best_R: Optional[np.ndarray] = None
        self.best_t: Optional[np.ndarray] = None
        self.best_s = 1.0

    def _project(self, Xc):
        import jax.numpy as jnp

        return np.asarray(self.cam.project(jnp.asarray(Xc)))

    def _check(self, R12, t12, s12) -> np.ndarray:
        # project X2 into image 1 via S12 and X1 into image 2 via S12^-1
        X2in1 = (s12 * (self.X2 @ R12.T) + t12)
        X1in2 = ((1.0 / s12) * ((self.X1 - t12) @ R12))
        ok_z = (X2in1[:, 2] > 0) & (X1in2[:, 2] > 0)
        uv1p = self._project(np.where(ok_z[:, None], X2in1, 1.0))
        uv2p = self._project(np.where(ok_z[:, None], X1in2, 1.0))
        e1 = np.sum((uv1p - self.uv1) ** 2, 1)
        e2 = np.sum((uv2p - self.uv2) ** 2, 1)
        return ok_z & (e1 < self.max_error) & (e2 < self.max_error)

    def iterate(self, n_iterations: int
                ) -> Tuple[Optional[np.ndarray], np.ndarray, int, bool]:
        """Run up to n_iterations; returns (T12 4x4 or None, inliers, n, no_more).

        Matches Sim3Solver::iterate semantics: returns a transform as soon as
        a hypothesis reaches min_inliers; no_more=True when the budget is
        exhausted."""
        if self.n < 3 or self.n < self.min_inliers:
            return None, np.zeros(self.n, bool), 0, True
        it = 0
        while it < n_iterations and \
                self.iterations_done < self.max_iterations:
            it += 1
            self.iterations_done += 1
            idx = self.rng.choice(self.n, 3, replace=False)
            R, t, s = horn_sim3(self.X1[idx].T, self.X2[idx].T,
                                self.fix_scale)
            inl = self._check(R, t, s)
            n_in = int(inl.sum())
            if n_in > self.best_n:
                self.best_n = n_in
                self.best_inliers = inl
                self.best_R, self.best_t, self.best_s = R, t, s
                if n_in >= self.min_inliers:
                    T = np.eye(4, dtype=np.float32)
                    T[:3, :3] = s * R
                    T[:3, 3] = t
                    return T, inl, n_in, False
        no_more = self.iterations_done >= self.max_iterations
        return None, self.best_inliers, self.best_n, no_more

    def get_estimates(self):
        return self.best_R, self.best_t, self.best_s
