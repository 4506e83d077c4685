"""Synthetic world harness: renders FrameFeatures without the neural nets.

Builds a 3-D scene (points, line segments, colinear triplets) plus stable
per-landmark descriptors, and renders per-frame FrameFeatures exactly in the
extractor's output format — so the matching / map / pipeline layers can be
tested end-to-end deterministically and dataset-free.
"""

from __future__ import annotations

import numpy as np

from ppg_slam_tpu.frontend.extractor import FrameFeatures
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel

CAM = CameraModel(kind=CAM_PINHOLE, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                  dist=(0.0, 0.0, 0.0, 0.0), width=640, height=480)


class SyntheticScene:
    def __init__(self, n_points=160, seed=7, cam: CameraModel = CAM,
                 extent=((-3, 3), (-2, 2), (4, 9))):
        rng = np.random.RandomState(seed)
        self.cam = cam
        self.rng = rng
        (x0, x1), (y0, y1), (z0, z1) = extent
        # free points
        pts = [np.stack([rng.uniform(x0, x1, n_points // 2),
                         rng.uniform(y0, y1, n_points // 2),
                         rng.uniform(z0, z1, n_points // 2)], 1)]
        # structured lines: triplets of collinear points (a, mid, b)
        self.triplets = []
        self.segments = []
        n_lines = n_points // 6
        base = n_points // 2
        line_pts = []
        for k in range(n_lines):
            a = np.array([rng.uniform(x0, x1), rng.uniform(y0, y1),
                          rng.uniform(z0, z1)])
            d = rng.randn(3)
            d /= np.linalg.norm(d)
            b = a + d * rng.uniform(0.8, 2.0)
            m = 0.5 * (a + b)
            i0 = base + 3 * k
            line_pts += [a, m, b]
            self.triplets.append((i0 + 1, i0, i0 + 2))  # (pivot=mid, a, b)
            self.segments += [(i0, i0 + 1), (i0 + 1, i0 + 2)]
        pts.append(np.stack(line_pts))
        self.points = np.concatenate(pts).astype(np.float32)
        self.n = len(self.points)
        d = rng.randn(self.n, 256).astype(np.float32)
        self.descs = d / np.linalg.norm(d, axis=1, keepdims=True)

    def pose(self, k: int, n_frames: int = 40, radius: float = 0.8):
        """Camera k on a smooth forward+lateral path looking at the scene."""
        from ppg_slam_tpu.geometry import so3
        import jax.numpy as jnp

        t_wc = np.array([radius * np.sin(0.15 * k), 0.1 * np.sin(0.3 * k),
                         0.06 * k], np.float32)
        ang = np.array([0.02 * np.sin(0.2 * k), 0.05 * np.sin(0.1 * k),
                        0.01 * np.cos(0.25 * k)], np.float32)
        Rwc = np.asarray(so3.exp(jnp.asarray(ang)), np.float32)
        Rcw = Rwc.T
        tcw = (-Rcw @ t_wc).astype(np.float32)
        return Rcw, tcw

    def render(self, Rcw: np.ndarray, tcw: np.ndarray, noise: float = 0.0,
               desc_noise: float = 0.0) -> tuple:
        """Returns (FrameFeatures, visible_global_ids)."""
        import jax.numpy as jnp

        Xc = self.points @ Rcw.T + tcw
        vis = Xc[:, 2] > 0.3
        uv = self.cam.project_np(Xc)
        if noise > 0:
            uv = uv + self.rng.randn(*uv.shape).astype(np.float32) * noise
        inb = ((uv[:, 0] >= 8) & (uv[:, 0] < self.cam.width - 8)
               & (uv[:, 1] >= 8) & (uv[:, 1] < self.cam.height - 8))
        vis = vis & inb
        ids = np.nonzero(vis)[0]
        uv_v = uv[ids].astype(np.float32)
        descs = self.descs[ids].copy()
        if desc_noise > 0:
            descs += self.rng.randn(*descs.shape).astype(np.float32) * desc_noise
            descs /= np.linalg.norm(descs, axis=1, keepdims=True)

        gid_to_local = {g: i for i, g in enumerate(ids)}
        edges = []
        for (a, b) in self.segments:
            if a in gid_to_local and b in gid_to_local:
                edges.append((gid_to_local[a], gid_to_local[b]))
        edges_np = (np.asarray(edges, np.int32) if edges
                    else np.zeros((0, 2), np.int32))
        colines = []
        for (piv, a, b) in self.triplets:
            if piv in gid_to_local and a in gid_to_local and b in gid_to_local:
                colines.append((gid_to_local[piv], gid_to_local[a],
                                gid_to_local[b]))
        col_np = (np.asarray(colines, np.int32) if colines
                  else np.zeros((0, 3), np.int32))
        connected = [[] for _ in range(len(ids))]
        for eid, (a, b) in enumerate(edges):
            connected[a].append(eid)
            connected[b].append(eid)

        feats = FrameFeatures(
            kp_pos=uv_v, kp_pos_un=uv_v.copy(),
            kp_score=np.ones(len(ids), np.float32),
            kp_out=np.zeros(len(ids), bool),
            edges=edges_np,
            edge_score=np.full(len(edges_np), 0.5, np.float32),
            colines=col_np, connected=connected, desc=descs,
        )
        return feats, ids
