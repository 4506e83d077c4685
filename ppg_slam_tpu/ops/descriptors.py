"""Per-keypoint descriptor sampling (reference genPointDescriptor).

Mirrors PPGExtractor.cpp:515-538: torch::grid_sampler(bilinear, zero padding,
align_corners=False) over the 1/8-resolution 256-d descriptor map at keypoint
positions normalized by the *full* image size, followed by L2 normalization.

TPU note: random-access gathers lower to scalar code on TPU (~29 ms/frame for
the 4-tap formulation, profiled on v5e). Bilinear sampling is instead
expressed as two separable one-hot interpolation matmuls on the MXU:
  t[n, x, :] = sum_y Wy[n, y] * desc[y, x, :]     (K, Hf) @ (Hf, Wf*D)
  out[n, :]  = sum_x Wx[n, x] * t[n, x, :]        batched contraction
where Wy/Wx carry the two bilinear taps per axis (zero weight out of bounds =
grid_sampler zero padding). ~1.5 GFLOP per frame -> microseconds on the MXU.
The reference's "< 10 keypoints -> all-zero descriptors" quirk (:520-524) is
replicated by the caller (frontend.extractor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DESC_DIM = 256


def _axis_weights(coord: jax.Array, size: int):
    """(K,) continuous source coords -> (K, size) two-tap bilinear weight
    matrix with zero padding outside [0, size)."""
    c0 = jnp.floor(coord)
    f = coord - c0
    c0i = c0.astype(jnp.int32)
    grid = jnp.arange(size, dtype=jnp.int32)[None, :]
    w0 = jnp.where((c0i >= 0) & (c0i < size), 1.0 - f, 0.0)
    w1 = jnp.where((c0i + 1 >= 0) & (c0i + 1 < size), f, 0.0)
    return (
        (grid == c0i[:, None]) * w0[:, None]
        + (grid == (c0i + 1)[:, None]) * w1[:, None]
    )


@functools.partial(jax.jit, static_argnames=("img_w", "img_h"))
def sample_descriptors(
    desc_map: jax.Array,
    kp_pos: jax.Array,
    kp_ok: jax.Array,
    img_w: int,
    img_h: int,
):
    """desc_map: (Hf, Wf, D) 1/8-res raw descriptors; kp_pos: (K, 2) pixel
    positions in full-image coords (distorted positions — the reference samples
    before undistortion overwrite); kp_ok: (K,) mask.

    Returns (K, D) L2-normalized float32 descriptors (zeros for masked slots).
    """
    hf, wf, d = desc_map.shape

    # torch grid_sampler align_corners=False unnormalization
    gx = kp_pos[:, 0] / img_w * 2.0 - 1.0
    gy = kp_pos[:, 1] / img_h * 2.0 - 1.0
    ix = ((gx + 1.0) * wf - 1.0) * 0.5
    iy = ((gy + 1.0) * hf - 1.0) * 0.5

    wy = _axis_weights(iy, hf)  # (K, Hf)
    wx = _axis_weights(ix, wf)  # (K, Wf)

    # y-interp on the MXU, then per-point x contraction on the VPU
    t = jnp.dot(wy, desc_map.reshape(hf, wf * d),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).reshape(-1, wf, d)
    val = jnp.einsum("kx,kxd->kd", wx, t,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    norm = jnp.linalg.norm(val, axis=-1, keepdims=True)
    out = val / jnp.maximum(norm, 1e-12)
    return jnp.where(kp_ok[:, None], out, 0.0)


def descriptor_distance_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise L2 distances between descriptor sets (MXU matmul form).

    The reference's DescriptorDistance (MapPoint.cpp:22-29) is the L2 norm of
    the difference of L2-normalized vectors; ||a-b||^2 = 2 - 2 a.b for unit
    vectors, computed here as one (Na, D) @ (D, Nb) matmul with f32
    accumulation — the MXU-resident heart of all matching.
    """
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(
        jnp.sum(a * a, -1)[:, None] + jnp.sum(b * b, -1)[None, :] - 2.0 * dots,
        0.0,
    )
    return jnp.sqrt(sq)
