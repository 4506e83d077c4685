"""MXU-friendly bulk image sampling via one-hot interpolation matmuls.

Random-access gathers lower to ~40 ns/element scalar code on TPU; bulk
sampling is instead expressed as chunked one-hot matmuls (profiled ~0.5-4 ms
for 10^5-10^6 samples on v5e):

  nearest:  out[n] = (one_hot(y_n) @ img)[x_n]         (row matmul + col mask)
  bilinear: rows = (wy-weighted 2-tap one-hot) @ img;  out = 2-tap col mix

Exactness: a one-hot row has <= 2 nonzeros, and f32 addition of exact zeros
is exact, so the matmul result is bit-identical to the direct 2-term formula
regardless of accumulation order — these are NOT approximations.

For nearest sampling of a BINARY mask the one-hot and the mask are exactly
representable in bfloat16, so that path runs at full bf16 MXU rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CHUNK = 32768


def _pad_to_chunks(n: int) -> int:
    return max(CHUNK, ((n + CHUNK - 1) // CHUNK) * CHUNK)


def nearest_binary(mask_bf16: jax.Array, ys: jax.Array, xs: jax.Array):
    """Sample a (H, W) 0/1 bfloat16 mask at integer (ys, xs): returns (N,)
    bool. Indices must be pre-clipped to the image. N must be a multiple of
    CHUNK (pad with zeros; padded lanes return mask[0, 0]-dependent garbage —
    mask them out in the caller)."""
    h, w = mask_bf16.shape
    n = ys.shape[0]
    hgrid = jnp.arange(h, dtype=jnp.int32)[None, :]
    wgrid = jnp.arange(w, dtype=jnp.int32)[None, :]

    def chunk(c, _):
        yc = jax.lax.dynamic_slice(ys, (c * CHUNK,), (CHUNK,))
        xc = jax.lax.dynamic_slice(xs, (c * CHUNK,), (CHUNK,))
        R = (yc[:, None] == hgrid).astype(jnp.bfloat16)
        rows = jnp.dot(R, mask_bf16, preferred_element_type=jnp.float32)
        hit = jnp.sum(rows * (xc[:, None] == wgrid), axis=1)
        return c + 1, hit > 0.5

    _, out = jax.lax.scan(chunk, 0, None, length=n // CHUNK)
    return out.reshape(-1)


def bilinear_f32(img: jax.Array, y: jax.Array, x: jax.Array):
    """Bilinear sample of a (H, W) f32 image at float (y, x), zero padding
    outside (ops.heatmap.bilinear_sample semantics). N must be a multiple of
    CHUNK."""
    h, w = img.shape
    n = y.shape[0]
    hgrid = jnp.arange(h, dtype=jnp.int32)[None, :]
    wgrid = jnp.arange(w, dtype=jnp.int32)[None, :]

    def chunk(c, _):
        yc = jax.lax.dynamic_slice(y, (c * CHUNK,), (CHUNK,))
        xc = jax.lax.dynamic_slice(x, (c * CHUNK,), (CHUNK,))
        y0 = jnp.floor(yc)
        x0 = jnp.floor(xc)
        fy = yc - y0
        fx = xc - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        # 2-tap row weights; out-of-range taps get zero weight (zero padding)
        Ry = ((y0i[:, None] == hgrid) * (1.0 - fy)[:, None]
              + ((y0i + 1)[:, None] == hgrid) * fy[:, None])
        rows = jnp.dot(Ry.astype(img.dtype), img,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        Cx = ((x0i[:, None] == wgrid) * (1.0 - fx)[:, None]
              + ((x0i + 1)[:, None] == wgrid) * fx[:, None])
        return c + 1, jnp.sum(rows * Cx, axis=1)

    _, out = jax.lax.scan(chunk, 0, None, length=n // CHUNK)
    return out.reshape(-1)


ROWCHUNK = 8


@functools.partial(jax.jit, static_argnames=("band",))
def remap_banded(heat: jax.Array, mapx: jax.Array, mapy: jax.Array,
                 band_lo: jax.Array, band: int):
    """cv::remap(INTER_LINEAR, zero padding) as banded one-hot matmuls.

    mapx/mapy: (H, W) f32 source coords; band_lo: (H/ROWCHUNK,) int32
    precomputed per-chunk input-band start (see `band_params`), `band` the
    static band height covering floor(mapy)..floor(mapy)+1 for each chunk of
    ROWCHUNK output rows.

    Per chunk: slice the shared input band (DMA), x-interpolate all chunk
    rows against their 2-tap one-hots (one (ROWCHUNK*W, W+1) @ (W+1, band)
    MXU matmul), then mix the two y-taps (VPU). Exact f32 bilinear
    (2-nonzero one-hot rows: see module docstring).
    """
    h, w = heat.shape
    # zero-pad the input so out-of-range taps read zeros; extra zero column
    # w serves as the target for invalid x taps.
    padded = jnp.zeros((h + 2 * band, w + 1), heat.dtype)
    padded = jax.lax.dynamic_update_slice(padded, heat, (band, 0))
    wg1 = jnp.arange(w + 1, dtype=jnp.int32)[None, None, :]
    brange = jnp.arange(band, dtype=jnp.int32)[None, None, :]
    n_chunks = h // ROWCHUNK

    def chunk(c, _):
        lo = band_lo[c]
        bandmat = jax.lax.dynamic_slice(padded, (lo + band, 0),
                                        (band, w + 1))
        r0 = c * ROWCHUNK
        mx = jax.lax.dynamic_slice(mapx, (r0, 0), (ROWCHUNK, w))
        my = jax.lax.dynamic_slice(mapy, (r0, 0), (ROWCHUNK, w))
        x0 = jnp.floor(mx)
        fx = mx - x0
        x0i = x0.astype(jnp.int32)
        in_x0 = (x0i >= 0) & (x0i < w)
        in_x1 = (x0i + 1 >= 0) & (x0i + 1 < w)
        x0c = jnp.where(in_x0, x0i, w)
        x1c = jnp.where(in_x1, x0i + 1, w)
        Wx = (
            (x0c[:, :, None] == wg1) * jnp.where(in_x0, 1.0 - fx, 0.0)[..., None]
            + (x1c[:, :, None] == wg1) * jnp.where(in_x1, fx, 0.0)[..., None]
        )  # (R, W, W+1)
        bx = jnp.dot(
            Wx.reshape(ROWCHUNK * w, w + 1).astype(heat.dtype), bandmat.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(ROWCHUNK, w, band)
        y0 = jnp.floor(my)
        fy = my - y0
        y0i = y0.astype(jnp.int32)
        in_y0 = (y0i >= 0) & (y0i < h)
        in_y1 = (y0i + 1 >= 0) & (y0i + 1 < h)
        d0 = y0i - lo
        Wy = (
            (d0[:, :, None] == brange) * jnp.where(in_y0, 1.0 - fy, 0.0)[..., None]
            + ((d0 + 1)[:, :, None] == brange) * jnp.where(in_y1, fy, 0.0)[..., None]
        )  # (R, W, band)
        return c + 1, jnp.sum(bx * Wy, axis=-1)

    _, out = jax.lax.scan(chunk, 0, None, length=n_chunks)
    return out.reshape(h, w)


def band_params(mapy, band_pad: int = 4):
    """Per-chunk input band start + static band height for remap_banded,
    computed on host at camera init (numpy)."""
    import numpy as np

    h = mapy.shape[0]
    assert h % ROWCHUNK == 0
    y0 = np.floor(mapy).astype(np.int32)
    y0c = y0.reshape(h // ROWCHUNK, -1)
    lo = y0c.min(axis=1) - 1
    hi = y0c.max(axis=1) + 2
    band = int((hi - lo).max()) + band_pad
    # keep the dynamic_slice start in range so XLA's index clamping can never
    # silently shift the band
    lo = np.clip(lo, -band, h)
    return lo.astype(np.int32), band
