"""The PPG front-end: one device program per frame + tiny host graph build.

TPU-native reorganization of the reference PPGExtractor::run
(/root/reference/feature/src/PPGExtractor.cpp:118-147). The reference does
4 CUDA forwards + CPU post-processing; here stage A is ONE jitted XLA program
(backbone + 3 heads + junction decode + exact NMS + keypoint undistortion +
heatmap refine/remap + all-pairs probe gate + descriptor sampling), the
sequential greedy suppression runs on host over small arrays, and stage B is a
second small device program validating the surviving candidate segments by
line sampling. Two host<->device round-trips per frame total.

Output contract matches the reference run(): keypoints (distorted +
undistorted; pinhole overwrites distorted with undistorted, :141-146),
KeyEdges with lscore, per-point colinear pairs, and 256-d L2-normalized
descriptors.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import CameraModel
from ..models import load_params, ppg_forward
from ..ops.descriptors import sample_descriptors
from ..ops.heatmap import refine_heatmap, remap_heatmap
from ..ops.lines import pair_probe_mask, validate_edges
from ..ops.nms import MAX_KEYPOINTS, nms_keypoints
from .graph_build import (
    finalize_edges_and_colines,
    pair_geometry_np,
    suppress_candidates,
)

MIN_KP_FOR_DESC = 10  # reference quirk: < 10 keypoints -> zero descriptors


@dataclasses.dataclass
class FrameFeatures:
    """Per-frame front-end output (host numpy; the reference's
    mvKeyPoints/mvKeyEdges/descriptor mat)."""

    kp_pos: np.ndarray      # (N, 2) float32 — mPos (== undistorted for pinhole)
    kp_pos_un: np.ndarray   # (N, 2) float32 — mPosUn
    kp_score: np.ndarray    # (N,)
    kp_out: np.ndarray      # (N,) bool — mbOut (outside usable image bounds)
    edges: np.ndarray       # (E, 2) int32 keypoint indices
    edge_score: np.ndarray  # (E,) lscore
    colines: np.ndarray     # (C, 3) int32 (pivot, p1, p2)
    connected: List[List[int]]  # per-keypoint final edge ids
    desc: np.ndarray        # (N, 256) float32 L2-normalized

    @property
    def n_kp(self) -> int:
        return len(self.kp_pos)


class PPGExtractor:
    """Per-camera fused front-end. Thread-compatible with the tracking loop."""

    def __init__(self, camera: CameraModel, weights_path: Optional[str] = None,
                 max_kp: int = MAX_KEYPOINTS):
        self.camera = camera
        self.max_kp = max_kp
        self.params = load_params(weights_path) if weights_path else load_params()
        self._has_dist = any(abs(d) > 0 for d in camera.dist)
        self._remap_xy = (
            jnp.asarray(camera.undistort_rectify_map()) if self._has_dist else None
        )

        cam = camera
        w, h = cam.width, cam.height

        def stage_a(params, remap_xy, image_u8):
            img = image_u8.astype(jnp.float32) / 255.0
            out = ppg_forward(params, img[None, :, :, None])
            junc = out["junc_prob"][0]
            heat = out["heat"][0]
            desc_map = out["desc"][0]

            kp_xy, kp_score, kp_valid = nms_keypoints(junc, max_kp=max_kp)
            kp_pos = kp_xy.astype(jnp.float32)
            kp_un = cam.undistort_points(kp_pos)
            in_img = (
                (kp_un[:, 0] >= 1) & (kp_un[:, 0] < w - 1)
                & (kp_un[:, 1] >= 1) & (kp_un[:, 1] < h - 1)
            )
            kp_ok = kp_valid & in_img

            heat = refine_heatmap(heat)
            if remap_xy is not None:
                heat = remap_heatmap(heat, remap_xy)
            probes = pair_probe_mask(heat, kp_un, kp_ok)
            descs = sample_descriptors(desc_map, kp_pos, kp_valid, w, h)
            return dict(kp_pos=kp_pos, kp_score=kp_score, kp_valid=kp_valid,
                        kp_un=kp_un, kp_ok=kp_ok, heat=heat, probes=probes,
                        descs=descs)

        self._stage_a = jax.jit(stage_a)
        self._stage_b = jax.jit(validate_edges)
        # candidate padding buckets (few distinct shapes -> few XLA programs)
        self._buckets = [256, 512, 1024, 2048, 4096, 8192]

    def warmup(self) -> None:
        """Compile both stages (the reference warms its CUDA nets similarly,
        PPGExtractor.cpp:98-107)."""
        img = np.ones((self.camera.height, self.camera.width), np.uint8)
        self.extract(img)

    # ------------------------------------------------------------------
    def extract(self, image_u8: np.ndarray) -> FrameFeatures:
        assert image_u8.ndim == 2, "single-channel images only"
        a = self._stage_a(self.params, self._remap_xy, jnp.asarray(image_u8))

        kp_pos = np.asarray(a["kp_pos"])
        kp_un = np.asarray(a["kp_un"])
        kp_score = np.asarray(a["kp_score"])
        kp_valid = np.asarray(a["kp_valid"])
        kp_ok = np.asarray(a["kp_ok"])
        probes = np.asarray(a["probes"])
        descs = np.asarray(a["descs"])
        n_kp = int(kp_valid.sum())

        # host: pair geometry + sequential greedy suppression
        dist, ang = pair_geometry_np(kp_un)
        cands, alive = suppress_candidates(probes, dist, ang)

        # device stage B: sampled validation of surviving candidates
        n_c = len(cands)
        if n_c:
            cap = next(b for b in self._buckets if b >= n_c) if n_c <= self._buckets[-1] else n_c
            idx = np.zeros((cap, 2), np.int32)
            ok = np.zeros((cap,), bool)
            idx[:n_c] = cands
            ok[:n_c] = alive
            rate, score = self._stage_b(
                a["heat"], jnp.asarray(kp_un[idx[:, 0]]),
                jnp.asarray(kp_un[idx[:, 1]]), jnp.asarray(ok),
            )
            rate = np.asarray(rate)[:n_c]
            score = np.asarray(score)[:n_c]
        else:
            rate = np.zeros((0,), np.float32)
            score = np.zeros((0,), np.float32)

        edges, lscore, colines, connected = finalize_edges_and_colines(
            cands, alive, rate, score, dist, ang, n_kp
        )

        desc_out = descs[:n_kp].copy()
        if n_kp < MIN_KP_FOR_DESC:  # reference genPointDescriptor quirk
            desc_out[:] = 0.0

        pos = kp_pos[:n_kp].copy()
        pos_un = kp_un[:n_kp].copy()
        if not self.camera.is_fisheye:
            pos = pos_un.copy()  # run() overwrites mPos with mPosUn (:141-146)
        return FrameFeatures(
            kp_pos=pos, kp_pos_un=pos_un, kp_score=kp_score[:n_kp].copy(),
            kp_out=~kp_ok[:n_kp], edges=edges, edge_score=lscore,
            colines=colines, connected=connected[:n_kp], desc=desc_out,
        )
