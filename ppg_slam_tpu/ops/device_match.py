"""Device-side gated descriptor matching: per-map-point top-K in-gate
keypoint distances.

Why this exists: the per-frame descriptor matrix (500 x 256, ~131 KB even
int8-quantized) dominates the front-end's device->host payload, and the only
per-frame consumer of it is data association (matching/matcher.py). This
program keeps frame descriptors device-resident and ships the *distances the
matcher can actually use* instead: for each candidate map point, the K
nearest frame keypoints among those inside the map point's grid-query
rectangle (the exact candidate set `Frame.features_in_area` would return —
the rect bounds are computed on host from the same projection the host
matcher uses and uploaded, so gate membership is bit-identical).

The matcher's sequential logic (best/second-best with claiming, ratio tests,
PPG seed-growing — Matcher.cpp:203-381) stays on host, reading these sparse
rows with missing pairs treated as "no match" (+inf). Exactness: decisions
match the host dense-descriptor matcher unless a map point has more than K
in-gate candidates and the winning keypoint ranks below K by distance
(measured <1% of associations on dense synthetic scenes at K=8; see
tests/test_device_match.py).

Separately, `quantize_desc_i8` serves the keyframe-rate descriptor fetch
(keyframes do need host descriptors: BoW, distinctive-descriptor selection,
KF-KF matching)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MATCH_K = 8          # kept candidates per map point
BIG = jnp.float32(1e6)


def dist_block(bank_rows: jax.Array, frame_desc: jax.Array) -> jax.Array:
    """Pairwise L2 distances (M, N) — mirrors matcher.desc_dist_matrix
    (norms + matmul + sqrt of clamped square). Matmuls run in bf16 with f32
    accumulation: descriptor components are O(0.06), so the distance error
    is ~3e-4 — below the int8 descriptor-transfer error (~1e-3) the host
    matching path already accepts, and 4x the f32 MXU rate."""
    a = bank_rows.astype(jnp.bfloat16)
    b = frame_desc.astype(jnp.bfloat16)
    a2 = jnp.sum((a * a).astype(jnp.float32), axis=1)
    b2 = jnp.sum((b * b).astype(jnp.float32), axis=1)
    d2 = a2[:, None] + b2[None, :] - 2.0 * jnp.dot(
        a, b.T, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def gated_topk(bank: jax.Array, bank_idx: jax.Array, frame_desc: jax.Array,
               kp_pos: jax.Array, kp_valid: jax.Array, rects: jax.Array,
               k: int = MATCH_K):
    """Top-k in-gate matches for M map points against one frame.

    bank:       (CAP, 256) f32 persistent descriptor bank
    bank_idx:   (M,) int32 bank slots of this frame's candidate map points
                (negative = dead row)
    frame_desc: (N, 256) f32 frame descriptors (device-resident)
    kp_pos:     (N, 2) f32 keypoint positions (the grid's kp 'mPos' array)
    kp_valid:   (N,) bool — grid-assignment eligibility (the host grid's
                in-bounds mask), uploaded by the host
    rects:      (M, 4) f32 [x_lo, x_hi, y_lo, y_hi] open-interval gate boxes
                = [cx - r, cx + r, cy - r, cy + r]; membership kp > lo and
                kp < hi reproduces Frame.features_in_area's |kp - c| < r
                check exactly (grid.py:78-80)

    Returns (idx (M, k) int32, dist (M, k) f32, n_gated (M,) int32); slots
    beyond a row's gate population have idx -1 / dist BIG.
    """
    cap = bank.shape[0]
    m = bank_idx.shape[0]
    live = bank_idx >= 0
    sel = jnp.where(live, bank_idx, 0)
    # gather M bank rows as a one-hot matmul (TPU-friendly; scalar gathers
    # lower to ~40ns/element loops). bf16 one-hot x bf16-rounded bank is an
    # EXACT row selection of the bf16 values; the (M x CAP x 256) gather is
    # the dominant FLOP term, so bf16 (vs f32) is a 4x cut.
    onehot = (sel[:, None] == jnp.arange(cap, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)
    rows = jnp.dot(onehot, bank.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    D = dist_block(rows, frame_desc)  # (M, N)

    x = kp_pos[:, 0][None, :]
    y = kp_pos[:, 1][None, :]
    inside = ((x > rects[:, 0:1]) & (x < rects[:, 1:2])
              & (y > rects[:, 2:3]) & (y < rects[:, 3:4])
              & kp_valid[None, :] & live[:, None])
    n_gated = jnp.sum(inside, axis=1).astype(jnp.int32)
    Dm = jnp.where(inside, D, BIG)
    neg, idx = jax.lax.top_k(-Dm, k)
    dist = -neg
    idx = jnp.where(dist < BIG, idx, -1)
    return idx.astype(jnp.int32), dist, n_gated


PAIR_CAP = 4096  # flat gated-pair transfer budget per frame (~24 KB)


def flatten_topk(idx: jax.Array, dist: jax.Array, n_gated: jax.Array,
                 pair_cap: int = PAIR_CAP):
    """Compact the (M, k) top-K tables into a flat pair list
    (row i16, kp i16, dist f16) of at most pair_cap live entries — the
    transfer size becomes independent of the query count M (queries with
    empty gates, the common case, cost nothing). Also returns the total
    live-pair count and the number of rows whose gate exceeded k."""
    m, k = idx.shape
    pair_cap = min(pair_cap, m * k)
    live = (idx >= 0).reshape(-1)
    flat_rows = jnp.repeat(jnp.arange(m, dtype=jnp.int32), k)
    flat_kp = idx.reshape(-1)
    flat_d = dist.reshape(-1)
    neg_big = jnp.int32(-(1 << 30))
    key = jnp.where(live, -jnp.arange(m * k, dtype=jnp.int32), neg_big)
    v, _ = jax.lax.top_k(key, pair_cap)
    ok = v > neg_big
    sel = jnp.where(ok, -v, 0)
    rows = jnp.where(ok, flat_rows[sel], -1)
    kps = jnp.where(ok, flat_kp[sel], -1)
    ds = jnp.where(ok, flat_d[sel], BIG)
    n_pairs = jnp.sum(live)
    n_over = jnp.sum(n_gated > k)
    return rows, kps, ds, n_pairs, n_over


def pack_match(rows, kps, ds, n_pairs, n_over) -> jax.Array:
    """Pack one frame's flat match list into a single uint8 buffer:
    int16 row / int16 kp / f16 dist (|err| ~3e-4 — an order below the int8
    descriptor-transfer error the f32 path already accepts) + 2 int32
    counters."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(rows.astype(jnp.int16),
                                     jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(kps.astype(jnp.int16),
                                     jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(ds.astype(jnp.float16),
                                     jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(
            jnp.stack([n_pairs.astype(jnp.int32), n_over.astype(jnp.int32)]),
            jnp.uint8).reshape(-1),
    ])


def unpack_match(buf: np.ndarray, pair_cap: int = PAIR_CAP):
    """Host-side inverse of pack_match: (rows, kps, dists, n_pairs, n_over)."""
    p = pair_cap
    rows = buf[:2 * p].view(np.int16)
    kps = buf[2 * p:4 * p].view(np.int16)
    ds = buf[4 * p:6 * p].view(np.float16)
    n_pairs, n_over = buf[6 * p:6 * p + 8].view(np.int32)
    return rows, kps, ds, int(n_pairs), int(n_over)


def match_bytes(pair_cap: int = PAIR_CAP) -> int:
    return pair_cap * 6 + 8


@functools.partial(jax.jit, static_argnames=("k", "pair_cap"))
def gated_match_packed(bank, bank_idx, frame_desc, kp_pos, kp_valid, rects,
                       k: int = MATCH_K, pair_cap: int = PAIR_CAP):
    out = gated_topk(bank, bank_idx, frame_desc, kp_pos, kp_valid, rects,
                     k=k)
    return pack_match(*flatten_topk(*out, pair_cap=pair_cap))


@functools.partial(jax.jit, static_argnames=("k", "pair_cap"))
def gated_match_batch_packed(bank, bank_idx_b, frame_desc_b, kp_pos_b,
                             kp_valid_b, rects_b, k: int = MATCH_K,
                             pair_cap: int = PAIR_CAP):
    """Batched variant (serving/throughput shape): one dispatch matches B
    frames against the shared bank; output (B, match_bytes)."""

    def one(bi, fd, kp, kv, rc):
        return pack_match(*flatten_topk(
            *gated_topk(bank, bi, fd, kp, kv, rc, k=k), pair_cap=pair_cap))

    return jax.vmap(one)(bank_idx_b, frame_desc_b, kp_pos_b, kp_valid_b,
                         rects_b)


# ---------------------------------------------------------------------------
# bank maintenance + keyframe-rate descriptor fetch
# ---------------------------------------------------------------------------

@jax.jit
def bank_update(bank: jax.Array, slots: jax.Array, descs: jax.Array):
    """Write `descs` (U, 256) into `bank` at `slots` (U,) (scatter; U is
    small — new/updated map points at keyframe rate)."""
    return bank.at[slots].set(descs)


@jax.jit
def quantize_desc_i8(descs: jax.Array):
    """Per-descriptor max-abs int8 quantization (same scheme as the
    extractor's i8 transfer mode) for the keyframe-rate descriptor fetch."""
    scale = jnp.maximum(jnp.max(jnp.abs(descs), axis=1), 1e-8)
    q = jnp.clip(jnp.round(descs / scale[:, None] * 127.0),
                 -127, 127).astype(jnp.int8)
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(q, jnp.uint8).reshape(-1),
        jax.lax.bitcast_convert_type(
            scale.astype(jnp.float16), jnp.uint8).reshape(-1),
    ])


def dequantize_desc_i8(buf: np.ndarray, n: int, dim: int = 256) -> np.ndarray:
    q = buf[:n * dim].view(np.int8).reshape(n, dim).astype(np.float32)
    scale = buf[n * dim:n * dim + 2 * n].view(np.float16).astype(np.float32)
    return q * (scale / 127.0)[:, None]
