"""Host-side PPG graph construction: greedy edge suppression + colinear triplets.

This is the inherently-sequential, order-dependent part of detectLines
(/root/reference/feature/src/PPGExtractor.cpp:293-442) that sits between the
two device programs. Inputs are small (<= 500 keypoints, a few thousand probe-
passing pairs); everything heavy (probing, sampling, descriptors) is on device.

Implemented in numpy with exact reference semantics (candidate order =
lexicographic (i, j); in-loop mutual kill rules; post-validation rebuild;
greedy best-pair colinear extraction). A C++ native version can replace this
behind the same interface if host time ever shows in the profile.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

LINE_DISTTHRESH = 2.0  # px (PPGExtractor.cpp:50)
ANGLE_THRESH = 0.2 * np.pi
LINE_INLIER_RATE = 0.8
LINE_HEATMAP_THRESH = 0.2


def pair_geometry_np(kp_un: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """dist/dir matrices (PPGExtractor.cpp:266-291). dir[j,i] = dir[i,j] - pi
    wrapped to > -pi (the reference only adds 2pi when < -pi)."""
    diff = kp_un[None, :, :] - kp_un[:, None, :]
    dist = np.linalg.norm(diff, axis=-1)
    ang = np.arctan2(diff[..., 1], diff[..., 0])
    return dist.astype(np.float32), ang.astype(np.float32)


def _wrap_abs_angle(a: float) -> float:
    if a < -np.pi:
        a += 2 * np.pi
    if a > np.pi:
        a -= 2 * np.pi
    return abs(a)


def suppress_candidates(
    probe_mask: np.ndarray, dist: np.ndarray, ang: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy overlap suppression (PPGExtractor.cpp:293-381).

    probe_mask: (K, K) bool gate (symmetric); dist/ang: (K, K).
    Returns (cands, alive): (C, 2) int32 candidate endpoint indices in
    construction order and their post-suppression liveness.

    Dispatches to the native C++ builder when available (ppg_slam_tpu.native);
    this Python implementation is the behavioral spec and fallback.
    """
    from ..native import get_lib

    lib = get_lib()
    if lib is not None:
        return _suppress_candidates_native(lib, probe_mask, dist, ang)
    return _suppress_candidates_py(probe_mask, dist, ang)


def _suppress_candidates_native(lib, probe_mask, dist, ang):
    import ctypes

    k = probe_mask.shape[0]
    max_cands = k * k // 2 + 1
    pm = np.ascontiguousarray(probe_mask.astype(np.uint8))
    d = np.ascontiguousarray(dist.astype(np.float32))
    a = np.ascontiguousarray(ang.astype(np.float32))
    out_c = np.zeros((max_cands, 2), np.int32)
    out_a = np.zeros(max_cands, np.uint8)
    n = lib.ppg_suppress_candidates(
        pm.ctypes.data_as(ctypes.c_void_p), d.ctypes.data_as(ctypes.c_void_p),
        a.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(k),
        out_c.ctypes.data_as(ctypes.c_void_p),
        out_a.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(max_cands))
    return out_c[:n].copy(), out_a[:n].astype(bool)


def _suppress_candidates_py(
    probe_mask: np.ndarray, dist: np.ndarray, ang: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    k = probe_mask.shape[0]
    cands: List[Tuple[int, int]] = []
    is_bad: List[bool] = []
    connected: List[List[int]] = [[] for _ in range(k)]

    iu, ju = np.nonzero(np.triu(probe_mask, 1))
    for i, j in zip(iu.tolist(), ju.tolist()):
        overlap = False
        for p_id, q_id in ((i, j), (j, i)):
            # note: loop over ALL old lines even once overlap=True (kills more)
            for lid in connected[p_id]:
                if is_bad[lid]:
                    continue
                a, b = cands[lid]
                pid_old = b if a == p_id else a
                angle_diff = _wrap_abs_angle(
                    float(ang[p_id, q_id]) - float(ang[p_id, pid_old])
                )
                if angle_diff > ANGLE_THRESH:
                    continue
                dist_new = float(dist[p_id, q_id])
                dist_old = float(dist[p_id, pid_old])
                s = np.sin(angle_diff)
                if dist_new <= dist_old and dist_new * s < LINE_DISTTHRESH:
                    is_bad[lid] = True
                if dist_old < dist_new and dist_old * s < LINE_DISTTHRESH:
                    overlap = True
            if overlap:
                break
        if overlap:
            continue
        lid = len(cands)
        cands.append((i, j))
        is_bad.append(False)
        connected[i].append(lid)
        connected[j].append(lid)

    if not cands:
        return np.zeros((0, 2), np.int32), np.zeros((0,), bool)
    return np.asarray(cands, np.int32), ~np.asarray(is_bad, bool)


def finalize_edges_and_colines(
    cands: np.ndarray,
    alive: np.ndarray,
    inlier_rate: np.ndarray,
    heat_score: np.ndarray,
    dist: np.ndarray,
    ang: np.ndarray,
    n_kp: int,
):
    """Validation thresholding + colinear triplets (PPGExtractor.cpp:361-442).

    Returns (edges (E,2) int32, lscore (E,), colines (C,3) int32 as
    (pivot, p1, p2), connected: list-of-lists of final edge ids per keypoint).
    """
    n_c = len(cands)
    good = alive & (inlier_rate >= LINE_INLIER_RATE) & (
        heat_score >= LINE_HEATMAP_THRESH
    )
    lscore_all = inlier_rate * heat_score

    connected_c: List[List[int]] = [[] for _ in range(n_kp)]
    for lid in range(n_c):
        if good[lid]:
            a, b = cands[lid]
            connected_c[a].append(lid)
            connected_c[b].append(lid)

    # colinear triplet extraction (greedy min-parallel-deviation pairing)
    colines: List[Tuple[int, int, int]] = []
    for p_id in range(n_kp):
        this = list(connected_c[p_id])
        while len(this) > 1:
            lid1 = this[-1]
            a, b = cands[lid1]
            p1_id = b if a == p_id else a
            best = (1e18, -1, -1, -1)  # (diff, idx, p1, p2)
            for idx in range(len(this) - 1):
                lid2 = this[idx]
                a2, b2 = cands[lid2]
                p2_id = b2 if a2 == p_id else a2
                angle_diff = float(ang[p_id, p1_id]) - float(ang[p_id, p2_id])
                par = (
                    0.5
                    * (float(dist[p_id, p1_id]) + float(dist[p_id, p2_id]))
                    * abs(np.sin(angle_diff))
                )
                if par < best[0]:
                    best = (par, idx, p1_id, p2_id)
            if best[0] > LINE_DISTTHRESH:
                this.pop()
                continue
            colines.append((p_id, best[2], best[3]))
            # replicate: pop_back(); [bestId] = back(); pop_back()
            this.pop()
            this[best[1]] = this[-1]
            this.pop()

    # final edge list in candidate order + per-keypoint adjacency
    edges: List[Tuple[int, int]] = []
    lscores: List[float] = []
    connected: List[List[int]] = [[] for _ in range(n_kp)]
    for lid in range(n_c):
        if not good[lid]:
            continue
        a, b = cands[lid]
        eid = len(edges)
        edges.append((a, b))
        lscores.append(float(lscore_all[lid]))
        connected[a].append(eid)
        connected[b].append(eid)

    edges_np = (
        np.asarray(edges, np.int32) if edges else np.zeros((0, 2), np.int32)
    )
    col_np = (
        np.asarray(colines, np.int32) if colines else np.zeros((0, 3), np.int32)
    )
    return edges_np, np.asarray(lscores, np.float32), col_np, connected
