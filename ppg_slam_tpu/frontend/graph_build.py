"""Host-side PPG graph construction: remap + probes + suppression + validation.

This is the host half of detectLines
(/root/reference/feature/src/PPGExtractor.cpp:236-442). Profiling on TPU v5e
showed the image-gather steps (heat-map remap, pair probing, line sampling)
lower to ~40 ns/element scalar code under XLA — 115 ms/frame — while the same
work is ~2-4 ms in C++ on host. So the device program keeps the MXU/VPU-
friendly work (CNN forwards, NMS, descriptor sampling) and everything from
the refined heat map onward runs here in one native call per frame
(`build_graph`), mirroring the reference's own GPU/CPU split.

The numpy implementations in this file are the behavioral spec and fallback
for the native library (ppg_slam_tpu.native); `tests/test_frontend_decode.py`
and `tests/test_extractor.py` pin both to the reference transcription.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

LINE_DISTTHRESH = 2.0  # px (PPGExtractor.cpp:50)
ANGLE_THRESH = 0.2 * np.pi
LINE_INLIER_RATE = 0.8
LINE_HEATMAP_THRESH = 0.2
INV_SAMPLE_GAP = (0.3333, 0.200, 0.1427, 0.1111)  # PPGExtractor.cpp:19


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
    """Validation thresholding + colinear triplets (PPGExtractor.cpp:361-442)
    from precomputed per-candidate (inlier_rate, heat_score). Thin wrapper
    over assemble_graph; used when validation ran on device (ops.lines)."""
    good = alive & (inlier_rate >= LINE_INLIER_RATE) & (
        heat_score >= LINE_HEATMAP_THRESH
    )
    return assemble_graph(cands, good, inlier_rate * heat_score, dist, ang,
                          n_kp)


# ---------------------------------------------------------------------------
# One-call host graph build (remap + probes + suppression + validation +
# colines). Native C++ fast path with a numpy spec fallback.
# ---------------------------------------------------------------------------

def remap_np(heat: np.ndarray, remap_xy: np.ndarray) -> np.ndarray:
    """cv::remap(INTER_LINEAR, BORDER_CONSTANT 0) in numpy f32 — the spec for
    native ppg_remap and ops.heatmap.remap_heatmap."""
    h, w = heat.shape
    x = remap_xy[..., 0].astype(np.float32)
    y = remap_xy[..., 1].astype(np.float32)
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(np.int32)
    y0i = y0.astype(np.int32)

    def tap(yi, xi):
        v = heat[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        return np.where(inb, v, np.float32(0.0))

    return (
        tap(y0i, x0i) * (1 - fx) * (1 - fy)
        + tap(y0i, x0i + 1) * fx * (1 - fy)
        + tap(y0i + 1, x0i) * (1 - fx) * fy
        + tap(y0i + 1, x0i + 1) * fx * fy
    ).astype(np.float32)


def _bilinear_np(heat: np.ndarray, x, y):
    h, w = heat.shape
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(np.int32)
    y0i = y0.astype(np.int32)

    def tap(yi, xi):
        v = heat[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        return np.where(inb, v, np.float32(0.0))

    return (
        tap(y0i, x0i) * (1 - fx) * (1 - fy)
        + tap(y0i, x0i + 1) * fx * (1 - fy)
        + tap(y0i + 1, x0i) * (1 - fx) * fy
        + tap(y0i + 1, x0i + 1) * fx * fy
    )


def probe_mask_np(heat: np.ndarray, kp_un: np.ndarray,
                  kp_ok: np.ndarray) -> np.ndarray:
    """3-midpoint probe gate over all pairs (PPGExtractor.cpp:303-313),
    numpy spec of ops.lines.pair_probe_mask."""
    h, w = heat.shape
    pi = kp_un[:, None, :].astype(np.float32)
    pj = kp_un[None, :, :].astype(np.float32)

    def probe(alpha):
        p = pj * np.float32(alpha) + pi * np.float32(1.0 - alpha)
        x = np.clip((p[..., 0] + 0.5).astype(np.int32), 0, w - 1)
        y = np.clip((p[..., 1] + 0.5).astype(np.int32), 0, h - 1)
        return heat[y, x] >= LINE_HEATMAP_THRESH

    ok = probe(0.2) & probe(0.8) & probe(0.5)
    valid = kp_ok[:, None] & kp_ok[None, :]
    np.fill_diagonal(ok, False)
    return ok & valid


def validate_np(heat: np.ndarray, cands: np.ndarray, alive: np.ndarray,
                kp_un: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Sampled line validation (heatMapInlierRate :461-498 / heatMapLineScore
    :500-513). Returns (good, lscore) per candidate.

    Exact segNum edge cases (PPGExtractor.cpp:486-497):
      * segNum == 0 (dist < 3 px): rate = 0/-1 = -0 -> fails the 0.8
        threshold -> candidate rejected;
      * segNum == 1 (3 <= dist < 6 px): rate = 0/0 = NaN -> NaN comparisons
        are false -> candidate PASSES with lscore = NaN in the reference.
        We pass it with a defined lscore (midpoint bilinear heat) instead —
        a NaN edge weight would poison downstream BA. Deliberate deviation.
    """
    h, w = heat.shape
    inv_scale = 1.0 / np.sqrt(float(h * h + w * w))
    n = len(cands)
    good = np.zeros(n, bool)
    lscore = np.zeros(n, np.float32)
    for lid in range(n):
        if not alive[lid]:
            continue
        ps = kp_un[cands[lid, 0]].astype(np.float32)
        pe = kp_un[cands[lid, 1]].astype(np.float32)
        d = float(np.linalg.norm(pe - ps))
        lvl = min(max(int(d * inv_scale * 4.0), 0), 3)
        seg = int(d * INV_SAMPLE_GAP[lvl])
        if seg < 1:
            continue  # reference: rate -0 < 0.8 -> rejected
        if seg == 1:
            good[lid] = True  # reference: NaN -> passes
            mid = 0.5 * (ps + pe)
            lscore[lid] = _bilinear_np(heat, mid[0], mid[1])
            continue
        step = np.float32(1.0 / seg)
        i = np.arange(1, seg, dtype=np.float32)
        px = ps[0] * step * i + pe[0] * step * (seg - i)
        py = ps[1] * step * i + pe[1] * step * (seg - i)
        rx = np.clip((px + 0.5).astype(np.int32), 0, w - 1)
        ry = np.clip((py + 0.5).astype(np.int32), 0, h - 1)
        rate = np.count_nonzero(
            heat[ry, rx] > LINE_HEATMAP_THRESH) / (seg - 1)
        score = np.sum(_bilinear_np(heat, px, py)) / (seg - 1)
        if rate >= LINE_INLIER_RATE and score >= LINE_HEATMAP_THRESH:
            good[lid] = True
            lscore[lid] = rate * score
    return good, lscore


def assemble_graph(cands: np.ndarray, good: np.ndarray, lscore: np.ndarray,
                   dist: np.ndarray, ang: np.ndarray, n_kp: int):
    """Colinear triplets + final edge list from validated candidates
    (PPGExtractor.cpp:391-442)."""
    n_c = len(cands)
    connected_c: List[List[int]] = [[] for _ in range(n_kp)]
    for lid in range(n_c):
        if good[lid]:
            a, b = cands[lid]
            connected_c[a].append(lid)
            connected_c[b].append(lid)

    colines: List[Tuple[int, int, int]] = []
    for p_id in range(n_kp):
        this = list(connected_c[p_id])
        while len(this) > 1:
            lid1 = this[-1]
            a, b = cands[lid1]
            p1_id = b if a == p_id else a
            best = (1e18, -1, -1, -1)
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
            this.pop()
            this[best[1]] = this[-1]
            this.pop()

    edges: List[Tuple[int, int]] = []
    lscores: List[float] = []
    connected: List[List[int]] = [[] for _ in range(n_kp)]
    for lid in range(n_c):
        if not good[lid]:
            continue
        a, b = cands[lid]
        eid = len(edges)
        edges.append((a, b))
        lscores.append(float(lscore[lid]))
        connected[a].append(eid)
        connected[b].append(eid)

    edges_np = (
        np.asarray(edges, np.int32) if edges else np.zeros((0, 2), np.int32)
    )
    col_np = (
        np.asarray(colines, np.int32) if colines else np.zeros((0, 3), np.int32)
    )
    return edges_np, np.asarray(lscores, np.float32), col_np, connected


def build_graph(heat: np.ndarray, kp_un: np.ndarray, kp_ok: np.ndarray):
    """Full host graph build on a heat map already in undistorted coords.

    Returns (edges (E,2) int32, lscore (E,) f32, colines (C,3) int32,
    connected: per-keypoint final edge-id lists).
    """
    from ..native import get_lib

    heat = np.ascontiguousarray(heat, np.float32)
    kp_un = np.ascontiguousarray(kp_un, np.float32)
    kp_ok = np.ascontiguousarray(kp_ok, np.uint8)
    k = len(kp_un)
    lib = get_lib()
    if lib is not None and k > 0:
        return _build_graph_native(lib, heat, kp_un, kp_ok)
    return _build_graph_py(heat, kp_un, kp_ok)


def _build_graph_native(lib, heat, kp_un, kp_ok):
    import ctypes

    h, w = heat.shape
    k = len(kp_un)
    max_edges = max(k * 8, 1024)
    max_col = max(k * 4, 512)
    out_edges = np.zeros((max_edges, 2), np.int32)
    out_lscore = np.zeros(max_edges, np.float32)
    out_col = np.zeros((max_col, 3), np.int32)
    out_cnt = np.zeros(k, np.int32)
    out_flat = np.zeros(max_edges * 2, np.int32)
    n_col = ctypes.c_int32(0)
    n_e = lib.ppg_build_graph(
        heat.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(h),
        ctypes.c_int(w), kp_un.ctypes.data_as(ctypes.c_void_p),
        kp_ok.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(k),
        out_edges.ctypes.data_as(ctypes.c_void_p),
        out_lscore.ctypes.data_as(ctypes.c_void_p),
        out_col.ctypes.data_as(ctypes.c_void_p),
        out_cnt.ctypes.data_as(ctypes.c_void_p),
        out_flat.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(max_edges), ctypes.c_int(max_col),
        ctypes.byref(n_col))
    connected: List[List[int]] = []
    off = 0
    for p in range(k):
        c = int(out_cnt[p])
        connected.append(out_flat[off:off + c].tolist())
        off += c
    return (out_edges[:n_e].copy(), out_lscore[:n_e].copy(),
            out_col[:n_col.value].copy(), connected)


# ---------------------------------------------------------------------------
# Finalize for the fully-device front-end: suppression + colines over
# candidates whose geometry and validation came from the device (ops.pairs).
# ---------------------------------------------------------------------------

def finalize_graph(ci, cj, dist_c, ang_ab, ang_ba, good_val, lscore_val,
                   n_kp: int):
    """Greedy overlap suppression (PPGExtractor.cpp:314-359) + colines +
    final lists over device-validated candidates (lex order). Native C++
    fast path, python spec fallback."""
    from ..native import get_lib

    ci = np.ascontiguousarray(ci, np.int32)
    cj = np.ascontiguousarray(cj, np.int32)
    dist_c = np.ascontiguousarray(dist_c, np.float32)
    ang_ab = np.ascontiguousarray(ang_ab, np.float32)
    ang_ba = np.ascontiguousarray(ang_ba, np.float32)
    good_val = np.ascontiguousarray(good_val, np.uint8)
    lscore_val = np.ascontiguousarray(lscore_val, np.float32)
    lib = get_lib()
    if lib is not None:
        return _finalize_graph_native(lib, ci, cj, dist_c, ang_ab, ang_ba,
                                      good_val, lscore_val, n_kp)
    return _finalize_graph_py(ci, cj, dist_c, ang_ab, ang_ba, good_val,
                              lscore_val, n_kp)


def _finalize_graph_native(lib, ci, cj, dist_c, ang_ab, ang_ba, good_val,
                           lscore_val, n_kp):
    import ctypes

    n = len(ci)
    max_edges = max(n, 1)
    max_col = max(n, 1)
    out_edges = np.zeros((max_edges, 2), np.int32)
    out_lscore = np.zeros(max_edges, np.float32)
    out_col = np.zeros((max_col, 3), np.int32)
    out_cnt = np.zeros(max(n_kp, 1), np.int32)
    out_flat = np.zeros(max_edges * 2, np.int32)
    n_col = ctypes.c_int32(0)
    n_e = lib.ppg_finalize_graph(
        ci.ctypes.data_as(ctypes.c_void_p),
        cj.ctypes.data_as(ctypes.c_void_p),
        dist_c.ctypes.data_as(ctypes.c_void_p),
        ang_ab.ctypes.data_as(ctypes.c_void_p),
        ang_ba.ctypes.data_as(ctypes.c_void_p),
        good_val.ctypes.data_as(ctypes.c_void_p),
        lscore_val.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(n), ctypes.c_int(n_kp),
        out_edges.ctypes.data_as(ctypes.c_void_p),
        out_lscore.ctypes.data_as(ctypes.c_void_p),
        out_col.ctypes.data_as(ctypes.c_void_p),
        out_cnt.ctypes.data_as(ctypes.c_void_p),
        out_flat.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(max_edges), ctypes.c_int(max_col), ctypes.byref(n_col))
    connected: List[List[int]] = []
    off = 0
    for p in range(n_kp):
        c = int(out_cnt[p])
        connected.append(out_flat[off:off + c].tolist())
        off += c
    return (out_edges[:n_e].copy(), out_lscore[:n_e].copy(),
            out_col[:n_col.value].copy(), connected)


def _finalize_graph_py(ci, cj, dist_c, ang_ab, ang_ba, good_val, lscore_val,
                       n_kp):
    n = len(ci)

    def ang_from(lid, p):
        return ang_ab[lid] if ci[lid] == p else ang_ba[lid]

    connected: List[List[int]] = [[] for _ in range(n_kp)]
    bad = np.zeros(n, bool)
    inserted = np.zeros(n, bool)
    for lid in range(n):
        i, j = int(ci[lid]), int(cj[lid])
        overlap = False
        for p, q in ((i, j), (j, i)):
            for old in connected[p]:
                if bad[old]:
                    continue
                adiff = _wrap_abs_angle(
                    float(ang_from(lid, p)) - float(ang_from(old, p)))
                if adiff > ANGLE_THRESH:
                    continue
                dn, do = float(dist_c[lid]), float(dist_c[old])
                s = np.sin(adiff)
                if dn <= do and dn * s < LINE_DISTTHRESH:
                    bad[old] = True
                if do < dn and do * s < LINE_DISTTHRESH:
                    overlap = True
            if overlap:
                break
        if overlap:
            continue
        inserted[lid] = True
        connected[i].append(lid)
        connected[j].append(lid)

    good = inserted & ~bad & good_val.astype(bool)

    # colines using per-candidate geometry
    conn2: List[List[int]] = [[] for _ in range(n_kp)]
    for lid in range(n):
        if good[lid]:
            conn2[int(ci[lid])].append(lid)
            conn2[int(cj[lid])].append(lid)
    colines: List[Tuple[int, int, int]] = []
    for p in range(n_kp):
        this = list(conn2[p])
        while len(this) > 1:
            lid1 = this[-1]
            p1 = int(cj[lid1]) if int(ci[lid1]) == p else int(ci[lid1])
            best = (1e18, -1, -1, -1)
            for idx in range(len(this) - 1):
                lid2 = this[idx]
                p2 = int(cj[lid2]) if int(ci[lid2]) == p else int(ci[lid2])
                par = 0.5 * (float(dist_c[lid1]) + float(dist_c[lid2])) * abs(
                    np.sin(float(ang_from(lid1, p)) - float(ang_from(lid2, p))))
                if par < best[0]:
                    best = (par, idx, p1, p2)
            if best[0] > LINE_DISTTHRESH:
                this.pop()
                continue
            colines.append((p, best[2], best[3]))
            this.pop()
            this[best[1]] = this[-1]
            this.pop()

    edges: List[Tuple[int, int]] = []
    lscores: List[float] = []
    conn_f: List[List[int]] = [[] for _ in range(n_kp)]
    for lid in range(n):
        if not good[lid]:
            continue
        eid = len(edges)
        edges.append((int(ci[lid]), int(cj[lid])))
        lscores.append(float(lscore_val[lid]))
        conn_f[int(ci[lid])].append(eid)
        conn_f[int(cj[lid])].append(eid)
    edges_np = (np.asarray(edges, np.int32) if edges
                else np.zeros((0, 2), np.int32))
    col_np = (np.asarray(colines, np.int32) if colines
              else np.zeros((0, 3), np.int32))
    return edges_np, np.asarray(lscores, np.float32), col_np, conn_f


def _build_graph_py(heat, kp_un, kp_ok):
    k = len(kp_un)
    if k == 0:
        return (np.zeros((0, 2), np.int32), np.zeros(0, np.float32),
                np.zeros((0, 3), np.int32), [])
    probes = probe_mask_np(heat, kp_un, kp_ok.astype(bool))
    dist, ang = pair_geometry_np(kp_un)
    cands, alive = _suppress_candidates_py(probes, dist, ang)
    good, lscore = validate_np(heat, cands, alive, kp_un)
    return assemble_graph(cands, good, lscore, dist, ang, k)
