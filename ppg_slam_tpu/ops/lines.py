"""PPG edge (line-segment) device ops: pair probing and sampled validation.

Reference behavior (PPGExtractor.cpp detectLines :236-442, heatMapInlierRate
:461-498, heatMapLineScore :500-513):
  * candidate gate: 3 probes at 20/50/80% of the segment must have heat >= 0.2
    at the *rounded* pixel (int(v + 0.5));
  * validation: segNum = int(dist * invGapTable[lenLevel]) samples along the
    segment; inlier rate = fraction of rounded-pixel probes with heat > 0.2;
    line score = mean bilinear heat; thresholds 0.8 / 0.2; lscore = rate*score.

The greedy overlap suppression between gate and validation is inherently
sequential and tiny — it runs on host (frontend.graph_build) between the two
device calls. Here everything is fixed-shape: pairs are (K, K) over the padded
keypoint buffer, candidates are a padded (E, 2) index list, samples are a
masked (E, MAX_SAMPLES) grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .heatmap import bilinear_sample

LINE_HEATMAP_THRESH = 0.2  # PPGExtractor.cpp:52
LINE_INLIER_RATE = 0.8
LINE_DISTTHRESH = 2.0
# exact reference constants (PPGExtractor.cpp:19): NOT 1/3, 1/7 etc.
INV_SAMPLE_GAP = (0.3333, 0.200, 0.1427, 0.1111)
MAX_SAMPLES = 128  # segNum is provably < 100 for all supported resolutions


@jax.jit
def pair_probe_mask(heat: jax.Array, kp_un: jax.Array, kp_ok: jax.Array):
    """3-midpoint probe gate over all keypoint pairs.

    heat: (H, W) refined+undistorted heat map; kp_un: (K, 2) undistorted
    positions; kp_ok: (K,) validity (in-image and not padding).
    Returns (K, K) bool, symmetric, i<j meaningful, diag False.
    """
    h, w = heat.shape
    k = kp_un.shape[0]
    pi = kp_un[:, None, :]  # (K, 1, 2)
    pj = kp_un[None, :, :]  # (1, K, 2)

    def probe(alpha):
        p = pj * alpha + pi * (1.0 - alpha)
        x = jnp.clip((p[..., 0] + 0.5).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((p[..., 1] + 0.5).astype(jnp.int32), 0, h - 1)
        return heat[y, x] >= LINE_HEATMAP_THRESH

    ok = probe(0.2) & probe(0.8) & probe(0.5)
    valid_pair = kp_ok[:, None] & kp_ok[None, :]
    not_diag = ~jnp.eye(k, dtype=bool)
    return ok & valid_pair & not_diag


@functools.partial(jax.jit, static_argnames=("max_samples",))
def validate_edges(
    heat: jax.Array,
    ps: jax.Array,
    pe: jax.Array,
    cand_ok: jax.Array,
    max_samples: int = MAX_SAMPLES,
):
    """Sampled line validation for a padded candidate list.

    ps/pe: (E, 2) float endpoint positions (undistorted); cand_ok: (E,) mask.
    Returns (inlier_rate, heat_score): (E,) floats. Candidates with
    segNum < 2 return rate=1, score=midpoint bilinear heat (the reference hits
    0/0 = NaN there, which its thresholds treat as "pass"; we pass cleanly).
    """
    h, w = heat.shape
    d = jnp.linalg.norm(pe - ps, axis=-1)
    inv_scale = 1.0 / jnp.sqrt(jnp.float32(h * h + w * w))
    len_level = jnp.clip((d * inv_scale * 4.0).astype(jnp.int32), 0, 3)
    inv_gap = jnp.asarray(INV_SAMPLE_GAP, heat.dtype)[len_level]
    seg_num = (d * inv_gap).astype(jnp.int32)

    i = jnp.arange(1, max_samples + 1, dtype=heat.dtype)  # (S,)
    sn = jnp.maximum(seg_num, 2).astype(heat.dtype)[:, None]
    step = 1.0 / sn
    alpha = i[None, :] * step  # weight on ps
    # sample = ps * step*i + pe * step*(segNum - i)
    sample = ps[:, None, :] * alpha[..., None] + pe[:, None, :] * (
        (sn - i[None, :])[..., None] * step[..., None]
    )
    smask = (i[None, :] <= (seg_num[:, None] - 1)) & cand_ok[:, None]

    sx, sy = sample[..., 0], sample[..., 1]
    rx = jnp.clip((sx + 0.5).astype(jnp.int32), 0, w - 1)
    ry = jnp.clip((sy + 0.5).astype(jnp.int32), 0, h - 1)
    inlier = (heat[ry, rx] > LINE_HEATMAP_THRESH) & smask
    bil = bilinear_sample(heat, sx, sy) * smask

    denom = jnp.maximum(seg_num - 1, 1).astype(heat.dtype)
    rate = jnp.sum(inlier, axis=1) / denom
    score = jnp.sum(bil, axis=1) / denom

    # segNum < 2: single midpoint fallback
    mid = 0.5 * (ps + pe)
    mid_v = bilinear_sample(heat, mid[..., 0], mid[..., 1])
    few = seg_num < 2
    rate = jnp.where(few, 1.0, rate)
    score = jnp.where(few, mid_v, score)
    return rate, score


def pair_geometry(kp_un: jax.Array):
    """(K, 2) undistorted keypoints -> (dist, dir) matrices, matching
    PPGExtractor.cpp:266-291: dir[i,j] = atan2(dy, dx) of j-i; dir[j,i] =
    dir[i,j] - pi wrapped to (-pi, pi]."""
    diff = kp_un[None, :, :] - kp_un[:, None, :]  # [i, j] = pj - pi
    dist = jnp.linalg.norm(diff, axis=-1)
    ang = jnp.arctan2(diff[..., 1], diff[..., 0])
    return dist, ang
