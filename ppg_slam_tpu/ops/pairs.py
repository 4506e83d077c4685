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

from .sampling import (CHUNK, _pad_to_chunks, bilinear_f32,
                       nearest_binary_packed, pack_binary_mask)

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


def probe_and_select(heat, kp_un, kp_ok):
    """3-probe gate over all pairs + compaction to the CAND_CAP bucket.

    heat: (H, W) f32 in undistorted coords; kp_un (K, 2); kp_ok (K,).
    Returns dict(ci, cj, cand_valid, n_cand, saturated).

    Phase 1 probes the FULL (K, K) midpoint matrix built by broadcasting
    (no index gathers — 131k-element gathers cost ~1 ms each on TPU while
    the extra K^2/2 redundant samples are nearly free through the one-hot
    sampler); row-major upper-triangle compaction = the reference's
    lexicographic construction order.
    """
    h, w = heat.shape
    k = kp_un.shape[0]
    mask = pack_binary_mask(heat >= LINE_HEATMAP_THRESH)

    # phase 1: midpoint probe for every (i, j) via outer broadcasting
    x = kp_un[:, 0]
    y = kp_un[:, 1]
    pmx = x[:, None] * 0.5 + x[None, :] * 0.5
    pmy = y[:, None] * 0.5 + y[None, :] * 0.5
    n_flat = k * k
    pad = _pad_to_chunks(n_flat) - n_flat
    ys = jnp.concatenate([_round_clip(pmy.reshape(-1), h - 1),
                          jnp.zeros(pad, jnp.int32)])
    xs = jnp.concatenate([_round_clip(pmx.reshape(-1), w - 1),
                          jnp.zeros(pad, jnp.int32)])
    hit_m = nearest_binary_packed(mask, ys, xs)[:n_flat].reshape(k, k)
    okm = (kp_ok[:, None] & kp_ok[None, :]
           & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :]))
    pass1 = (hit_m & okm).reshape(-1)

    # compact survivors in row-major (= lex (i, j)) order via top_k on
    # negated flat indices — ~2 ms cheaper than jnp.nonzero(size=...) on TPU
    neg_big = jnp.int32(-(1 << 30))
    key1 = jnp.where(pass1, -jnp.arange(n_flat, dtype=jnp.int32), neg_big)
    v1, _ = jax.lax.top_k(key1, PHASE2_CAP)
    valid1 = v1 > neg_big
    sel1 = jnp.where(valid1, -v1, 0)
    i1 = (sel1 // k).astype(jnp.int32)
    j1 = (sel1 % k).astype(jnp.int32)
    a1 = kp_un[i1]
    b1 = kp_un[j1]

    # phase 2: 20% / 80% probes for survivors (one CHUNK-sized pool)
    p02 = b1 * jnp.float32(0.2) + a1 * jnp.float32(0.8)
    p08 = b1 * jnp.float32(0.8) + a1 * jnp.float32(0.2)
    ys = jnp.concatenate([_round_clip(p02[:, 1], h - 1),
                          _round_clip(p08[:, 1], h - 1)])
    xs = jnp.concatenate([_round_clip(p02[:, 0], w - 1),
                          _round_clip(p08[:, 0], w - 1)])
    hits = nearest_binary_packed(mask, ys, xs)
    pass2 = valid1 & hits[:PHASE2_CAP] & hits[PHASE2_CAP:]

    key2 = jnp.where(pass2, -jnp.arange(PHASE2_CAP, dtype=jnp.int32), neg_big)
    v2, _ = jax.lax.top_k(key2, CAND_CAP)
    sel2 = jnp.where(v2 > neg_big, -v2, 0)
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


SHORT_S = 32                  # sample slots for short candidates (seg <= 32)
LONG_CAP = 512                # max long candidates (seg in (32, MAX_SEG])


def _grid_positions(ps, pe, seg, n_slots):
    """Fixed (C, n_slots) line-sample grid: sample i (1-based) is live iff
    i <= seg-1. Pure broadcasting — no repeat/pool/gathers."""
    i_s = jnp.arange(1, n_slots + 1, dtype=jnp.float32)[None, :]  # (1, S)
    segf = jnp.maximum(seg, 1).astype(jnp.float32)[:, None]
    step = 1.0 / segf
    live = i_s <= (seg[:, None] - 1).astype(jnp.float32)
    posx = ps[:, 0:1] * (i_s * step) + pe[:, 0:1] * ((segf - i_s) * step)
    posy = ps[:, 1:2] * (i_s * step) + pe[:, 1:2] * ((segf - i_s) * step)
    return posx, posy, live


def _rate_grid(mask, h, w, ps, pe, seg, n_slots):
    """Inlier rate over a sample grid — nearest sampling of the bit-packed
    binary mask (cheap: the one-hot table is W/8 wide)."""
    c = ps.shape[0]
    posx, posy, live = _grid_positions(ps, pe, seg, n_slots)
    n = c * n_slots
    pad = _pad_to_chunks(n) - n
    fy = jnp.concatenate([posy.reshape(-1), jnp.zeros(pad, jnp.float32)])
    fx = jnp.concatenate([posx.reshape(-1), jnp.zeros(pad, jnp.float32)])
    inl = nearest_binary_packed(mask, _round_clip(fy, h - 1),
                                _round_clip(fx, w - 1))[:n].reshape(c,
                                                                    n_slots)
    cnt = jnp.sum(jnp.where(live, inl, False).astype(jnp.float32), axis=1)
    return cnt / jnp.maximum(seg - 1, 1).astype(jnp.float32)


def _score_grid(heat, ps, pe, seg, n_slots):
    """Mean bilinear heat over a sample grid — the expensive f32 sampling;
    callers compact to rate-passing candidates first (the score only
    matters where the rate test already passed: `good` requires both)."""
    c = ps.shape[0]
    posx, posy, live = _grid_positions(ps, pe, seg, n_slots)
    n = c * n_slots
    pad = _pad_to_chunks(n) - n
    # explicit f32 pad: under the tests' x64 mode a default-dtype zeros
    # promotes the whole sample grid (and the downstream scatter value) to
    # f64 — a FutureWarning today, an error in a future JAX
    fy = jnp.concatenate([posy.reshape(-1), jnp.zeros(pad, jnp.float32)])
    fx = jnp.concatenate([posx.reshape(-1), jnp.zeros(pad, jnp.float32)])
    bil = bilinear_f32(heat, fy, fx)[:n].reshape(c, n_slots)
    ssum = jnp.sum(jnp.where(live, bil, 0.0), axis=1)
    return ssum / jnp.maximum(seg - 1, 1).astype(jnp.float32)


SCORE_S_CAP = 2048            # rate-passing shorts that get a heat score


def validate_candidates(heat, kp_un, ci, cj, dist, cand_valid):
    """Sampled line validation, rate-gated: the cheap binary inlier RATE
    (bit-packed nearest sampling) runs for every candidate on fixed grids —
    shorts on (CAND_CAP, SHORT_S), longs compacted into (LONG_CAP, MAX_SEG)
    — and the expensive f32 bilinear SCORE runs only for candidates whose
    rate already passes (`good` requires both, so gating is exact), shorts
    compacted into (SCORE_S_CAP, SHORT_S), rate-passing longs into
    (LONG_CAP, MAX_SEG).

    Returns (good, lscore, overflow): (CAND_CAP,) bool / f32 / scalar bool
    (overflow = more long candidates than LONG_CAP or more rate-passing
    shorts than SCORE_S_CAP; the excess are dropped).
    """
    h, w = heat.shape
    mask = pack_binary_mask(heat > LINE_HEATMAP_THRESH)
    inv_scale = 1.0 / np.sqrt(float(h * h + w * w))
    lvl = jnp.clip((dist * inv_scale * 4.0).astype(jnp.int32), 0, 3)
    seg = jnp.clip((dist * jnp.asarray(INV_SAMPLE_GAP, jnp.float32)[lvl])
                   .astype(jnp.int32), 0, MAX_SEG)
    seg = jnp.where(cand_valid, seg, 0)

    ps = kp_un[ci]
    pe = kp_un[cj]
    is_long = seg > SHORT_S
    neg_big = jnp.int32(-(1 << 30))
    iota = jnp.arange(CAND_CAP, dtype=jnp.int32)

    # ---- rate (nearest, full coverage) --------------------------------
    rate = _rate_grid(mask, h, w, ps, pe, jnp.where(is_long, 0, seg),
                      SHORT_S)
    keyl = jnp.where(is_long, -iota, neg_big)
    n_long = jnp.sum(is_long)

    def long_rate(r):
        vl, _ = jax.lax.top_k(keyl, LONG_CAP)
        lsel = jnp.where(vl > neg_big, -vl, 0)
        lvalid = vl > neg_big
        rate_l = _rate_grid(mask, h, w, ps[lsel], pe[lsel],
                            jnp.where(lvalid, seg[lsel], 0), MAX_SEG)
        return r.at[lsel].set(jnp.where(lvalid, rate_l, r[lsel]))

    rate = jax.lax.cond(n_long > 0, long_rate, lambda r: r, rate)
    fits = ~is_long | (jnp.cumsum(is_long) <= LONG_CAP)

    # ---- score (bilinear, rate-gated + compacted) ---------------------
    need = cand_valid & fits & (seg >= 2) & (rate >= LINE_INLIER_RATE)
    score = jnp.zeros(CAND_CAP, jnp.float32)

    need_s = need & ~is_long
    keyss = jnp.where(need_s, -iota, neg_big)

    def short_score(s):
        vs, _ = jax.lax.top_k(keyss, SCORE_S_CAP)
        ssel = jnp.where(vs > neg_big, -vs, 0)
        svalid = vs > neg_big
        sc = _score_grid(heat, ps[ssel], pe[ssel],
                         jnp.where(svalid, seg[ssel], 0), SHORT_S)
        return s.at[ssel].set(jnp.where(svalid, sc, s[ssel]))

    score = jax.lax.cond(jnp.any(need_s), short_score, lambda s: s, score)

    need_l = need & is_long
    keysl = jnp.where(need_l, -iota, neg_big)

    def long_score(s):
        vl, _ = jax.lax.top_k(keysl, LONG_CAP)
        lsel = jnp.where(vl > neg_big, -vl, 0)
        lvalid = vl > neg_big
        sc = _score_grid(heat, ps[lsel], pe[lsel],
                         jnp.where(lvalid, seg[lsel], 0), MAX_SEG)
        return s.at[lsel].set(jnp.where(lvalid, sc, s[lsel]))

    score = jax.lax.cond(jnp.any(need_l), long_score, lambda s: s, score)
    overflow = (n_long > LONG_CAP) | (jnp.sum(need_s) > SCORE_S_CAP)
    fits_s = ~need_s | (jnp.cumsum(need_s) <= SCORE_S_CAP)

    # seg == 1: reference NaN -> passes; lscore = defined midpoint heat
    mid = 0.5 * (ps + pe)
    midv = bilinear_f32(heat, mid[:, 1], mid[:, 0])

    seg1 = seg == 1
    good = cand_valid & fits & fits_s & (
        seg1 | ((seg >= 2) & (rate >= LINE_INLIER_RATE)
                & (score >= LINE_HEATMAP_THRESH)))
    lscore = jnp.where(seg1, midv, rate * score)
    lscore = jnp.where(good, lscore, 0.0)
    return good, lscore, overflow
