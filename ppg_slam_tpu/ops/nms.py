"""Exact greedy keypoint NMS (reference PPGExtractor.cpp:158-206) on device.

The reference sorts all above-threshold junction pixels by score and greedily
accepts them, suppressing a (2r+1)^2 window around each accepted point, capped
at 500. A candidate is rejected iff it lies within Chebyshev radius r of an
already-accepted point, or within r of the image border.

TPU design: top-K candidate extraction via `lax.top_k` (VPU-friendly full-map
reduction) followed by a sequential `lax.scan` over the K score-sorted
candidates carrying the survivor list. K=2048 bounds the scan statically; the
junction threshold (1/128) keeps real candidate counts well below that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_KEYPOINTS = 500  # JUNCTION_MAX_NUM (PPGExtractor.cpp:47)
NMS_RADIUS = 4  # JUNCTION_NMS_RADIUS
JUNCTION_THRESH = 1.0 / 128.0
TOPK_CANDIDATES = 2048


@functools.partial(
    jax.jit,
    static_argnames=("max_kp", "radius", "topk"),
)
def nms_keypoints(
    junc_prob: jax.Array,
    thresh: float = JUNCTION_THRESH,
    max_kp: int = MAX_KEYPOINTS,
    radius: int = NMS_RADIUS,
    topk: int = TOPK_CANDIDATES,
):
    """Greedy NMS over a (H, W) junction probability map.

    Returns (xy, score, valid): (max_kp, 2) int32 pixel coords (x, y),
    (max_kp,) float scores, (max_kp,) bool validity mask. Order = acceptance
    order (score-descending), matching the reference's keypoint indexing.
    """
    h, w = junc_prob.shape
    flat = junc_prob.reshape(-1)
    scores, idx = jax.lax.top_k(flat, topk)
    ys = idx // w
    xs = idx % w
    cand_ok = (
        (scores >= thresh)
        & (xs >= radius) & (xs <= w - radius - 1)
        & (ys >= radius) & (ys <= h - radius - 1)
    )

    def body(carry, cand):
        sx, sy, count = carry
        x, y, ok = cand
        dx = jnp.abs(sx - x)
        dy = jnp.abs(sy - y)
        slot = jnp.arange(max_kp) < count
        suppressed = jnp.any(slot & (dx <= radius) & (dy <= radius))
        accept = ok & ~suppressed & (count < max_kp)
        sx = jnp.where(accept, sx.at[count].set(x), sx)
        sy = jnp.where(accept, sy.at[count].set(y), sy)
        count = count + accept.astype(jnp.int32)
        return (sx, sy, count), accept

    init = (
        jnp.full((max_kp,), -(10 * (radius + 1)), jnp.int32),
        jnp.full((max_kp,), -(10 * (radius + 1)), jnp.int32),
        jnp.int32(0),
    )
    (sx, sy, count), accepted = jax.lax.scan(
        body, init, (xs.astype(jnp.int32), ys.astype(jnp.int32), cand_ok)
    )
    valid = jnp.arange(max_kp) < count
    xy = jnp.stack([sx, sy], axis=-1)
    # scores in acceptance order: accepted candidates are already score-sorted,
    # so gather them compactly.
    acc_scores = jnp.where(accepted, scores, -jnp.inf)
    order = jnp.argsort(-acc_scores)[:max_kp]
    kp_scores = jnp.where(valid, acc_scores[order], 0.0)
    return xy, kp_scores, valid
