"""Line-heatmap post-processing: tile-adaptive refinement + undistortion remap.

Reference behavior (PPGExtractor.cpp:236-263, refineHeatMap :540-578):
  * per 16x16 tile: collect values > 1e-2 (row-major); valCount = 0.3*K
    (int); if valCount < 1 the tile is left untouched; if K >= 0.9*256 AND
    the (0.9*K)-th above-threshold value *in scan order* > 0.1 the tile is
    zeroed (saturated); otherwise values > 1e-2 are divided by the mean of the
    top valCount values (clamped to 1) and values <= 1e-2 are zeroed.
  * cv::remap(INTER_LINEAR) with precomputed undistortion maps.

All dataset resolutions divide by 16 exactly (752x480, 512x512, 1024x1024,
1024x768), so tiles are uniform — one vectorized op over (nTiles, 256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LINE_VALID_THRESH = 1.0e-2  # PPGExtractor.cpp:48
LINE_VALID_RATIO = 0.3
HEATMAP_REFINE_SZ = 16


@jax.jit
def refine_heatmap(heat: jax.Array) -> jax.Array:
    """Tile-adaptive normalization of a (H, W) heat map (refineHeatMap)."""
    h, w = heat.shape
    ts = HEATMAP_REFINE_SZ
    assert h % ts == 0 and w % ts == 0, "image dims must divide by 16"
    gy, gx = h // ts, w // ts
    n = ts * ts
    tiles = heat.reshape(gy, ts, gx, ts).transpose(0, 2, 1, 3).reshape(-1, n)

    mask = tiles > LINE_VALID_THRESH
    K = jnp.sum(mask, axis=1)  # above-threshold count per tile
    val_count = (LINE_VALID_RATIO * K).astype(jnp.int32)

    # scan-order rank of each above-threshold element
    rank = jnp.cumsum(mask, axis=1) - 1
    sat_idx = (0.9 * K).astype(jnp.int32)
    sat_val = jnp.sum(
        jnp.where(mask & (rank == sat_idx[:, None]), tiles, 0.0), axis=1
    )
    saturated = (K >= int(0.9 * n)) & (sat_val > 0.1)

    # mean of top valCount above-threshold values
    sorted_vals = jnp.sort(jnp.where(mask, tiles, -jnp.inf), axis=1)[:, ::-1]
    csum = jnp.cumsum(jnp.where(jnp.isfinite(sorted_vals), sorted_vals, 0.0), axis=1)
    vc = jnp.clip(val_count, 1, n)
    ave = jnp.take_along_axis(csum, (vc - 1)[:, None], axis=1)[:, 0] / vc

    refined = jnp.where(mask, jnp.minimum(tiles / ave[:, None], 1.0), 0.0)
    out = jnp.where(saturated[:, None], 0.0, refined)
    out = jnp.where((val_count < 1)[:, None], tiles, out)  # untouched tiles

    return out.reshape(gy, gx, ts, ts).transpose(0, 2, 1, 3).reshape(h, w)


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array,
                    *, zero_outside: bool = True) -> jax.Array:
    """Bilinear sample of (H, W) image at float coords; zero padding outside
    (cv::remap BORDER_CONSTANT 0 semantics)."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        if zero_outside:
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            v = jnp.where(inb, v, 0.0)
        return v

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@jax.jit
def remap_heatmap(heat: jax.Array, remap_xy: jax.Array) -> jax.Array:
    """cv::remap(INTER_LINEAR) equivalent: remap_xy is (H, W, 2) source coords
    (the precomputed undistortion map, cameras.undistort_rectify_map)."""
    return bilinear_sample(heat, remap_xy[..., 0], remap_xy[..., 1])
