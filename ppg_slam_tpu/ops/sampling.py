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

    def block(yc, xc):
        R = (yc[:, None] == hgrid).astype(jnp.bfloat16)
        # one-hot row x binary mask -> rows are exactly 0/1: bf16 is exact
        # and halves the (CHUNK, W) intermediate traffic
        rows = jnp.dot(R, mask_bf16, preferred_element_type=jnp.bfloat16)
        hit = jnp.sum(
            jnp.where(xc[:, None] == wgrid, rows, jnp.bfloat16(0)).astype(
                jnp.float32), axis=1)
        return hit > 0.5

    if n <= CHUNK:  # small call: one unscanned block
        return block(ys, xs)

    def chunk(c, _):
        yc = jax.lax.dynamic_slice(ys, (c * CHUNK,), (CHUNK,))
        xc = jax.lax.dynamic_slice(xs, (c * CHUNK,), (CHUNK,))
        return c + 1, block(yc, xc)

    _, out = jax.lax.scan(chunk, 0, None, length=n // CHUNK)
    return out.reshape(-1)


def pack_binary_mask(mask_bool: jax.Array) -> jax.Array:
    """Pack a (H, W) boolean mask into (H, ceil(W/8)) bf16 bytes.

    Each output value is an integer 0..255 (exactly representable in bf16:
    8 significand bits) holding 8 consecutive column bits, LSB = lowest x.
    Shrinks the one-hot row-matmul table 8x for binary nearest sampling."""
    h, w = mask_bool.shape
    w8 = (w + 7) // 8
    pad = w8 * 8 - w
    m = mask_bool
    if pad:
        m = jnp.concatenate(
            [m, jnp.zeros((h, pad), mask_bool.dtype)], axis=1)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.float32)
    packed = jnp.sum(m.reshape(h, w8, 8).astype(jnp.float32)
                     * weights[None, None, :], axis=2)
    return packed.astype(jnp.bfloat16)


SBLK = 2048  # pallas sample-block size (VMEM one-hot: SBLK x H bf16)


@functools.lru_cache(None)
def _pallas_sampling() -> bool:
    """Opt-in (PPG_PALLAS=1) Pallas route for bulk nearest sampling.

    The kernel builds each SBLK one-hot block in VMEM and never spills it
    to HBM — in isolation it matches the XLA path bit-for-bit — but
    measured INSIDE the batched front-end program it is a net loss
    (8.8 vs 6.3 ms/frame): a Mosaic call inside the decode's lax.map is an
    opaque boundary XLA cannot fuse or software-pipeline across, which
    costs more than the one-hot HBM spill it avoids. Kept as opt-in
    infrastructure + spec (tests pin pallas == XLA semantics)."""
    import os

    if not os.environ.get("PPG_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


def _nearest_binary_packed_kernel(y_ref, x_ref, mask_ref, out_ref):
    """One SBLK block: one-hot row pick (MXU, VMEM-resident) + byte select
    + exact power-of-two bit extract. Bit-identical math to the XLA path."""
    h, w8 = mask_ref.shape
    yc = y_ref[0, 0, :]
    xc = x_ref[0, 0, :]
    hgrid = jax.lax.broadcasted_iota(jnp.int32, (SBLK, h), 1)
    # f32 operands: Mosaic rejects bf16 lhs for this dot shape ("Bad lhs
    # type"); exactness is unchanged (0/1 one-hot x bytes <= 255) and both
    # stay VMEM-resident, which is the point of the kernel
    R = (yc[:, None] == hgrid).astype(jnp.float32)
    rows = jnp.dot(R, mask_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    xb = xc // 8
    w8grid = jax.lax.broadcasted_iota(jnp.int32, (SBLK, w8), 1)
    byte = jnp.sum(jnp.where(xb[:, None] == w8grid, rows, 0.0), axis=1)
    p = jnp.exp2((xc - xb * 8).astype(jnp.float32))
    q = jnp.floor(byte / p)
    out_ref[0, 0, :] = q - 2.0 * jnp.floor(q * 0.5)


def _nearest_binary_packed_pallas(packed_bf16, ys, xs, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = ys.shape[0]
    assert n % SBLK == 0, n
    nblk = n // SBLK
    # (nblk, 1, SBLK) with (1, 1, SBLK) blocks: the last two block dims
    # equal the array dims, satisfying the Mosaic (8, 128)-tiling rule
    spec = pl.BlockSpec((1, 1, SBLK), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _nearest_binary_packed_kernel,
        grid=(nblk,),
        in_specs=[spec, spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],  # whole mask
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nblk, 1, SBLK), jnp.float32),
        interpret=interpret,
    )(ys.reshape(nblk, 1, SBLK), xs.reshape(nblk, 1, SBLK), packed_bf16)
    return out.reshape(-1) > 0.5


def nearest_binary_packed(packed_bf16: jax.Array, ys: jax.Array,
                          xs: jax.Array):
    """nearest_binary against a pack_binary_mask table: 8x narrower matmul.

    The one-hot row pick returns each sample's byte exactly (0/1 one-hot x
    integers <= 255: bf16-exact); the bit is then extracted with exact f32
    power-of-two arithmetic. Semantics identical to nearest_binary on the
    unpacked mask. On TPU the block runs as a Pallas kernel with the
    one-hot VMEM-resident (see _pallas_sampling)."""
    h, w8 = packed_bf16.shape
    n = ys.shape[0]
    if _pallas_sampling() and n % SBLK == 0:
        return _nearest_binary_packed_pallas(packed_bf16, ys, xs)
    hgrid = jnp.arange(h, dtype=jnp.int32)[None, :]
    w8grid = jnp.arange(w8, dtype=jnp.int32)[None, :]

    def block(yc, xc):
        R = (yc[:, None] == hgrid).astype(jnp.bfloat16)
        rows = jnp.dot(R, packed_bf16,
                       preferred_element_type=jnp.float32)  # (C, W8) bytes
        xb = xc // 8
        byte = jnp.sum(jnp.where(xb[:, None] == w8grid, rows, 0.0), axis=1)
        p = jnp.exp2((xc - xb * 8).astype(jnp.float32))
        q = jnp.floor(byte / p)
        return (q - 2.0 * jnp.floor(q * 0.5)) > 0.5

    if n <= CHUNK:
        return block(ys, xs)

    def chunk(c, _):
        yc = jax.lax.dynamic_slice(ys, (c * CHUNK,), (CHUNK,))
        xc = jax.lax.dynamic_slice(xs, (c * CHUNK,), (CHUNK,))
        return c + 1, block(yc, xc)

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

    def block(yc, xc):
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
                       precision=jax.lax.Precision.HIGH)
        Cx = ((x0i[:, None] == wgrid) * (1.0 - fx)[:, None]
              + ((x0i + 1)[:, None] == wgrid) * fx[:, None])
        return jnp.sum(rows * Cx, axis=1)

    if n <= CHUNK:  # small call: one unscanned block
        return block(y, x)

    def chunk(c, _):
        yc = jax.lax.dynamic_slice(y, (c * CHUNK,), (CHUNK,))
        xc = jax.lax.dynamic_slice(x, (c * CHUNK,), (CHUNK,))
        return c + 1, block(yc, xc)

    _, out = jax.lax.scan(chunk, 0, None, length=n // CHUNK)
    return out.reshape(-1)


ROWCHUNK = 8
COLTILE = 128


@functools.partial(jax.jit, static_argnames=("band", "src_w"))
def remap_banded(heat: jax.Array, mapx: jax.Array, mapy: jax.Array,
                 band_lo: jax.Array, band: int, col_lo: jax.Array,
                 src_w: int):
    """cv::remap(INTER_LINEAR, zero padding) as 2D-tiled one-hot matmuls.

    Undistortion maps are smooth: each (ROWCHUNK x COLTILE) output tile reads
    a small (band x src_w) input window, precomputed on host (`band_params`).
    Per tile: slice the input window (DMA), x-interpolate against the tile's
    2-tap one-hots (one (ROWCHUNK*COLTILE, src_w) MXU matmul — tiling the
    one-hot to the window keeps its materialization ~16x smaller than a
    full-width formulation), then mix the two y-taps (VPU). Exact f32
    bilinear (2-nonzero one-hot rows: see module docstring).

    mapx/mapy: (H, W) f32 source coords; band_lo (H/ROWCHUNK,
    ceil(W/COLTILE)) int32 per-TILE row-window starts (fisheye
    undistortion rows CURVE — at TUM-VI 1024 the per-chunk y-span across
    a full row is ~62-75 px while the per-tile span is ~10-20, so a
    per-chunk band wastes 3-4x window traffic); col_lo
    (H/ROWCHUNK, ceil(W/COLTILE)) int32.
    """
    h, w = heat.shape
    n_chunks = h // ROWCHUNK
    n_tiles = -(-w // COLTILE)
    w_out = n_tiles * COLTILE
    # zero-pad so out-of-range taps read zeros (row band + column window)
    padded = jnp.zeros((h + 2 * band, w + 2 * src_w), heat.dtype)
    padded = jax.lax.dynamic_update_slice(padded, heat, (band, src_w))
    # pad the maps to the tiled output width (extra outputs discarded)
    if w_out != w:
        mapx = jnp.pad(mapx, ((0, 0), (0, w_out - w)))
        mapy = jnp.pad(mapy, ((0, 0), (0, w_out - w)))
    sgrid = jnp.arange(src_w, dtype=jnp.int32)[None, None, :]
    brange = jnp.arange(band, dtype=jnp.int32)[None, None, :]

    def chunk(c, _):
        r0 = c * ROWCHUNK

        def tile(t):
            lo = band_lo[c, t]
            xlo = col_lo[c, t]
            win = jax.lax.dynamic_slice(
                padded, (lo + band, xlo + src_w), (band, src_w))
            mx = jax.lax.dynamic_slice(mapx, (r0, t * COLTILE),
                                       (ROWCHUNK, COLTILE))
            my = jax.lax.dynamic_slice(mapy, (r0, t * COLTILE),
                                       (ROWCHUNK, COLTILE))
            x0 = jnp.floor(mx)
            fx = mx - x0
            x0i = x0.astype(jnp.int32)
            in_x0 = (x0i >= 0) & (x0i < w)
            in_x1 = (x0i + 1 >= 0) & (x0i + 1 < w)
            l0 = jnp.clip(x0i - xlo, 0, src_w - 1)      # local window index
            l1 = jnp.clip(x0i + 1 - xlo, 0, src_w - 1)  # (weights gate oob)
            Wx = (
                (l0[:, :, None] == sgrid)
                * jnp.where(in_x0, 1.0 - fx, 0.0)[..., None]
                + (l1[:, :, None] == sgrid)
                * jnp.where(in_x1, fx, 0.0)[..., None]
            )  # (R, CT, src_w)
            bx = jnp.dot(
                Wx.reshape(ROWCHUNK * COLTILE, src_w).astype(heat.dtype),
                win.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(ROWCHUNK, COLTILE, band)
            y0 = jnp.floor(my)
            fy = my - y0
            y0i = y0.astype(jnp.int32)
            in_y0 = (y0i >= 0) & (y0i < h)
            in_y1 = (y0i + 1 >= 0) & (y0i + 1 < h)
            d0 = y0i - lo
            Wy = (
                (d0[:, :, None] == brange)
                * jnp.where(in_y0, 1.0 - fy, 0.0)[..., None]
                + ((d0 + 1)[:, :, None] == brange)
                * jnp.where(in_y1, fy, 0.0)[..., None]
            )  # (R, CT, band)
            return jnp.sum(bx * Wy, axis=-1)

        row = jnp.concatenate([tile(t) for t in range(n_tiles)], axis=1)
        return c + 1, row

    _, out = jax.lax.scan(chunk, 0, None, length=n_chunks)
    return out.reshape(h, w_out)[:, :w]


def band_params(mapx, mapy, band_pad: int = 4):
    """Host-precomputed tile windows for remap_banded: per-(chunk, tile)
    input band start + static band height, per-(chunk, tile) input column
    start + static window width (numpy, once per camera). The row band is
    per-TILE because fisheye undistortion rows curve: at TUM-VI 1024 the
    full-row y-span is ~62-75 px while the per-tile span is ~10-20."""
    import numpy as np

    h, w = mapy.shape
    assert h % ROWCHUNK == 0
    n_chunks = h // ROWCHUNK
    n_tiles = -(-w // COLTILE)
    y0 = np.floor(mapy).astype(np.int32)
    y0p = np.full((h, n_tiles * COLTILE), 0, np.int32)
    y0p[:, :w] = y0
    y0p[:, w:] = y0[:, -1:]
    y0t = y0p.reshape(n_chunks, ROWCHUNK, n_tiles, COLTILE)
    ymin = y0t.min(axis=(1, 3)) - 1
    ymax = y0t.max(axis=(1, 3)) + 2
    band = int((ymax - ymin).max()) + band_pad
    band = -(-band // 8) * 8  # sublane-align the y-mix dim
    lo = np.clip(ymin, -band, h)

    x0 = np.floor(mapx).astype(np.int32)
    x0p = np.full((h, n_tiles * COLTILE), 0, np.int32)
    x0p[:, :w] = x0
    x0p[:, w:] = x0[:, -1:]
    x0t = x0p.reshape(n_chunks, ROWCHUNK, n_tiles, COLTILE)
    cmin = x0t.min(axis=(1, 3)) - 1
    cmax = x0t.max(axis=(1, 3)) + 2
    src_w = int((cmax - cmin).max()) + band_pad
    src_w = -(-src_w // 8) * 8  # sublane-align the contraction dim
    col_lo = np.clip(cmin, -src_w, w)
    return (lo.astype(np.int32), band, col_lo.astype(np.int32), src_w)
