"""Exact greedy keypoint NMS (reference PPGExtractor.cpp:158-206) on device.

The reference sorts all above-threshold junction pixels by score and greedily
accepts them, suppressing a (2r+1)^2 window around each accepted point, capped
at 500. A candidate is rejected iff it lies within Chebyshev radius r of an
already-accepted point, or within r of the image border.

Two equivalent TPU implementations:

* `nms_keypoints` (DEFAULT, fast): iterated local-max acceptance. A candidate
  whose score is the maximum over its (2r+1)^2 window is accepted; a
  dilation of the accepted set suppresses its neighbours; repeat until no
  candidates remain. For distinct scores this provably equals greedy NMS
  (every greedy acceptance is a local max among surviving candidates, and
  acceptance order doesn't change the accepted SET); the final top-500 by
  (score desc, index asc) reproduces the reference's acceptance-order
  indexing. Ties inside one window are resolved towards the lower flat index
  in a final pass (`_tie_cleanup` on device). reduce_window maxpools are
  VPU-friendly: ~0.15 ms vs 8.8 ms for the scan on v5e.

* `nms_keypoints_scan` (spec): sequential `lax.scan` over top-K score-sorted
  candidates — a direct transcription of the reference loop, kept as the
  behavioral oracle (tests assert fast == scan).
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
    static_argnames=("max_kp", "radius", "max_iters"),
)
def nms_keypoints(
    junc_prob: jax.Array,
    thresh: float = JUNCTION_THRESH,
    max_kp: int = MAX_KEYPOINTS,
    radius: int = NMS_RADIUS,
    max_iters: int = 32,
):
    """Greedy NMS via iterated local-max acceptance (fast path; see module
    docstring for the equivalence argument).

    Returns (xy, score, valid): (max_kp, 2) int32 pixel coords (x, y),
    (max_kp,) float scores, (max_kp,) bool validity mask. Order = acceptance
    order (score desc, flat index asc on ties) — the reference's indexing.
    """
    h, w = junc_prob.shape
    win = 2 * radius + 1
    ys, xs = jnp.mgrid[0:h, 0:w]
    border_ok = (
        (xs >= radius) & (xs <= w - radius - 1)
        & (ys >= radius) & (ys <= h - radius - 1)
    )
    cand0 = (junc_prob >= thresh) & border_ok
    neg_inf = jnp.float32(-jnp.inf)

    def maxpool(a):
        # separable (win, win) max: two 1-D passes — exactly equal for max
        # over a rectangle, ~win/2 x fewer comparisons than the 2-D window
        a = jax.lax.reduce_window(
            a, neg_inf, jax.lax.max, (win, 1), (1, 1), "SAME")
        return jax.lax.reduce_window(
            a, neg_inf, jax.lax.max, (1, win), (1, 1), "SAME")

    def cond(state):
        cand, _, i = state
        return jnp.any(cand) & (i < max_iters)

    def body(state):
        cand, acc, i = state
        sc = jnp.where(cand, junc_prob, neg_inf)
        local = cand & (sc >= maxpool(sc))
        acc = acc | local
        # dilate accepted set to suppress its neighbourhood (incl. itself)
        sup = maxpool(jnp.where(local, 1.0, neg_inf)) > 0
        return cand & ~sup, acc, i + 1

    cand, acc, _ = jax.lax.while_loop(
        cond, body, (cand0, jnp.zeros_like(cand0), jnp.int32(0)))

    # tie cleanup: two accepted equal-score pixels inside one window -> keep
    # the lower flat index (greedy accepts the earlier candidate and its
    # suppression removes the later one).
    flat_idx = (ys * w + xs).astype(jnp.float32)
    asc = jnp.where(acc, junc_prob, neg_inf)
    amax = maxpool(asc)
    # lowest flat index among accepted pixels achieving the local max score
    idx_of_max = -maxpool(jnp.where(acc & (asc == amax), -flat_idx, neg_inf))
    tie_loser = acc & (asc == amax) & (flat_idx > idx_of_max)
    acc = acc & ~tie_loser

    # rank accepted pixels by (score desc, index asc) == acceptance order
    sc_flat = jnp.where(acc, junc_prob, 0.0).reshape(-1)
    kp_scores, idx = jax.lax.top_k(sc_flat, max_kp)
    valid = kp_scores > 0.0
    xy = jnp.stack([(idx % w).astype(jnp.int32),
                    (idx // w).astype(jnp.int32)], axis=-1)
    xy = jnp.where(valid[:, None], xy, -(10 * (radius + 1)))
    kp_scores = jnp.where(valid, kp_scores, 0.0)
    return xy, kp_scores, valid


@functools.partial(
    jax.jit,
    static_argnames=("max_kp", "radius", "topk"),
)
def nms_keypoints_scan(
    junc_prob: jax.Array,
    thresh: float = JUNCTION_THRESH,
    max_kp: int = MAX_KEYPOINTS,
    radius: int = NMS_RADIUS,
    topk: int = TOPK_CANDIDATES,
):
    """Greedy NMS over a (H, W) junction probability map (sequential scan —
    the behavioral spec; the fast path must match it).

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
