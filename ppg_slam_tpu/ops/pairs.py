"""Device-side PPG pair probing, candidate extraction, and line validation.

Implements the data-parallel parts of detectLines
(/root/reference/feature/src/PPGExtractor.cpp:236-442) with static shapes:

  1. all-pairs 3-probe gate (:303-313) — two-phase: the midpoint probe runs
     over every (i<j) pair, survivors are compacted (lex order preserved)
     and probed at 20%/80%;
  2. candidate compaction to a fixed bucket, in lexicographic (i, j) order —
     the reference's construction order, which the host greedy suppression
     depends on;
  3. per-candidate pair geometry (dist / atan2 both directions,
     :266-291) — elementwise on the VPU;
  4. sampled line validation (heatMapInlierRate :461-498, heatMapLineScore
     :500-513) over a flat shared sample pool: per-candidate sample counts
     are data-dependent, so samples are packed with `jnp.repeat(...,
     total_repeat_length=POOL)` and reduced back per candidate with a cumsum
     + boundary gather. Exact segNum edge cases as graph_build.validate_np.

All image sampling goes through ops.sampling one-hot matmuls (gathers are
~40 ns/element scalar code on TPU). The greedy, order-dependent suppression
stays on host (native C++): it is inherently sequential and ~0.5 ms there vs
~16 ms as a lax.scan on device (measured).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import CHUNK, bilinear_f32, nearest_binary

LINE_HEATMAP_THRESH = 0.2
LINE_INLIER_RATE = 0.8
INV_SAMPLE_GAP = (0.3333, 0.200, 0.1427, 0.1111)  # PPGExtractor.cpp:19

PAIR_PAD = 4 * CHUNK          # >= 500*499/2 = 124750
PHASE2_CAP = CHUNK // 2       # pairs surviving the midpoint probe
CAND_CAP = 4096               # pairs surviving all 3 probes
POOL = 4 * CHUNK              # validation sample pool
MAX_SEG = 127


def make_pair_tables(max_kp: int):
    """Static lex-ordered (i, j) enumeration of all i<j pairs, padded to
    PAIR_PAD with (0, 0) (masked out via kp_ok)."""
    iu, ju = np.triu_indices(max_kp, 1)
    n = len(iu)
    assert n <= PAIR_PAD, (n, PAIR_PAD)
    pi = np.zeros(PAIR_PAD, np.int32)
    pj = np.zeros(PAIR_PAD, np.int32)
    pi[:n] = iu
    pj[:n] = ju
    real = np.zeros(PAIR_PAD, bool)
    real[:n] = True
    return jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(real)


def _round_clip(v, lim):
    return jnp.clip((v + 0.5).astype(jnp.int32), 0, lim)


def probe_and_select(heat, kp_un, kp_ok, pi, pj, real):
    """3-probe gate over all pairs + compaction to the CAND_CAP bucket.

    heat: (H, W) f32 in undistorted coords; kp_un (K, 2); kp_ok (K,).
    Returns dict(ci, cj, cand_valid, n_cand, saturated).
    """
    h, w = heat.shape
    mask = (heat >= LINE_HEATMAP_THRESH).astype(jnp.bfloat16)
    xi = kp_un[pi]
    xj = kp_un[pj]
    ok = real & kp_ok[pi] & kp_ok[pj]

    # phase 1: midpoint probe for every pair
    pm = xj * 0.5 + xi * 0.5
    hit_m = nearest_binary(mask, _round_clip(pm[:, 1], h - 1),
                           _round_clip(pm[:, 0], w - 1))
    pass1 = ok & hit_m

    # compact survivors (lex order preserved by nonzero)
    sel1 = jnp.nonzero(pass1, size=PHASE2_CAP, fill_value=PAIR_PAD - 1)[0]
    valid1 = jnp.arange(PHASE2_CAP) < jnp.sum(pass1)
    i1 = pi[sel1]
    j1 = pj[sel1]
    a1 = kp_un[i1]
    b1 = kp_un[j1]

    # phase 2: 20% / 80% probes for survivors (one CHUNK-sized pool)
    p02 = b1 * jnp.float32(0.2) + a1 * jnp.float32(0.8)
    p08 = b1 * jnp.float32(0.8) + a1 * jnp.float32(0.2)
    ys = jnp.concatenate([_round_clip(p02[:, 1], h - 1),
                          _round_clip(p08[:, 1], h - 1)])
    xs = jnp.concatenate([_round_clip(p02[:, 0], w - 1),
                          _round_clip(p08[:, 0], w - 1)])
    hits = nearest_binary(mask, ys, xs)
    pass2 = valid1 & hits[:PHASE2_CAP] & hits[PHASE2_CAP:]

    sel2 = jnp.nonzero(pass2, size=CAND_CAP, fill_value=PHASE2_CAP - 1)[0]
    n_cand = jnp.sum(pass2)
    cand_valid = jnp.arange(CAND_CAP) < n_cand
    ci = jnp.where(cand_valid, i1[sel2], 0)
    cj = jnp.where(cand_valid, j1[sel2], 0)
    saturated = (jnp.sum(pass1) > PHASE2_CAP) | (n_cand > CAND_CAP)
    return dict(ci=ci, cj=cj, cand_valid=cand_valid, n_cand=n_cand,
                saturated=saturated)


def candidate_geometry(kp_un, ci, cj):
    """Per-candidate dist / ang (both directions), direct atan2 both ways
    (matching frontend.graph_build.pair_geometry_np / native
    ppg_pair_geometry)."""
    d = kp_un[cj] - kp_un[ci]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ang_ab = jnp.arctan2(d[:, 1], d[:, 0])
    ang_ba = jnp.arctan2(-d[:, 1], -d[:, 0])
    return dist, ang_ab, ang_ba


def validate_candidates(heat, kp_un, ci, cj, dist, cand_valid):
    """Sampled line validation over the flat POOL (module docstring).

    Returns (good, lscore, overflow): (CAND_CAP,) bool / f32 / scalar bool.
    """
    h, w = heat.shape
    mask = (heat > LINE_HEATMAP_THRESH).astype(jnp.bfloat16)
    inv_scale = 1.0 / np.sqrt(float(h * h + w * w))
    lvl = jnp.clip((dist * inv_scale * 4.0).astype(jnp.int32), 0, 3)
    seg = jnp.clip((dist * jnp.asarray(INV_SAMPLE_GAP, jnp.float32)[lvl])
                   .astype(jnp.int32), 0, MAX_SEG)
    seg = jnp.where(cand_valid, seg, 0)
    nsamp = jnp.maximum(seg - 1, 0)

    start = jnp.cumsum(nsamp) - nsamp          # exclusive prefix
    end = start + nsamp
    overflow = end[-1] > POOL
    # candidates whose samples spill past POOL are computed wrong -> drop
    fits = end <= POOL

    cand_of = jnp.repeat(jnp.arange(CAND_CAP), nsamp,
                         total_repeat_length=POOL)
    rank = jnp.arange(POOL) - start[cand_of]   # 0..nsamp-1
    in_pool = jnp.arange(POOL) < end[-1]

    ps = kp_un[ci][cand_of]
    pe = kp_un[cj][cand_of]
    segf = seg[cand_of].astype(jnp.float32)
    step = 1.0 / jnp.maximum(segf, 1.0)
    i_s = (rank + 1).astype(jnp.float32)
    pos = ps * (i_s * step)[:, None] + pe * ((segf - i_s) * step)[:, None]

    inlier = nearest_binary(mask, _round_clip(pos[:, 1], h - 1),
                            _round_clip(pos[:, 0], w - 1))
    inlier = (inlier & in_pool).astype(jnp.float32)
    bil = bilinear_f32(heat, pos[:, 1], pos[:, 0]) * in_pool

    # segment sums: a flat f32 cumsum would lose ~eps(pool_total) (~0.008 at
    # 1e5) extracting small per-candidate sums from large prefixes. Each
    # candidate has <= MAX_SEG-1 = 126 consecutive samples, spanning at most
    # 2 of the 128-sample blocks, so in-block f32 prefixes (magnitude <= 128,
    # exact to ~1e-5) + a 2-piece extraction give full precision with no f64.
    BLK = 128
    vals = jnp.stack([inlier, bil], axis=1).reshape(POOL // BLK, BLK, 2)
    P = jnp.cumsum(vals, axis=1)             # in-block inclusive prefix

    s = start
    e = end - 1                               # inclusive; valid iff nsamp > 0
    b0 = s // BLK
    s_in = s % BLK
    b1 = jnp.maximum(e, 0) // BLK
    e_in = jnp.maximum(e, 0) % BLK

    def pref(b, i):                           # P[b, i, :] with i = -1 -> 0
        v = P[b, jnp.maximum(i, 0)]
        return jnp.where((i >= 0)[:, None], v, 0.0)

    head = pref(b0, jnp.full_like(s, BLK - 1)) - pref(b0, s_in - 1)
    tail = pref(b1, e_in)
    same = (b0 == b1)[:, None]
    sums = jnp.where(same, pref(b0, e_in) - pref(b0, s_in - 1), head + tail)
    sums = jnp.where((nsamp > 0)[:, None], sums, 0.0)
    cnt = sums[:, 0]
    ssum = sums[:, 1]

    denom = jnp.maximum(nsamp, 1).astype(jnp.float32)
    rate = cnt / denom
    score = ssum / denom

    # seg == 1: reference NaN -> passes; lscore = defined midpoint heat
    mid = 0.5 * (kp_un[ci] + kp_un[cj])
    pad = CHUNK - CAND_CAP
    midv = bilinear_f32(heat,
                        jnp.concatenate([mid[:, 1], jnp.zeros(pad)]),
                        jnp.concatenate([mid[:, 0], jnp.zeros(pad)]))[:CAND_CAP]

    seg1 = seg == 1
    good = cand_valid & fits & (
        seg1 | ((seg >= 2) & (rate >= LINE_INLIER_RATE)
                & (score >= LINE_HEATMAP_THRESH)))
    lscore = jnp.where(seg1, midv, rate * score)
    lscore = jnp.where(good, lscore, 0.0)
    return good, lscore, overflow
