"""Per-keypoint descriptor sampling (reference genPointDescriptor).

Mirrors PPGExtractor.cpp:515-538: torch::grid_sampler(bilinear, zero padding,
align_corners=False) over the 1/8-resolution 256-d descriptor map at keypoint
positions normalized by the *full* image size, followed by L2 normalization.

TPU note: the semi-dense descriptor map stays in NHWC; sampling is 4 gathers +
a fused normalize. The reference's "< 10 keypoints -> all-zero descriptors"
quirk (:520-524) is replicated by the caller (frontend.extractor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DESC_DIM = 256


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

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0)[:, None]
    fy = (iy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        v = desc_map[jnp.clip(yi, 0, hf - 1), jnp.clip(xi, 0, wf - 1)]
        inb = ((xi >= 0) & (xi < wf) & (yi >= 0) & (yi < hf))[:, None]
        return jnp.where(inb, v, 0.0)

    val = (
        tap(y0i, x0i) * (1 - fx) * (1 - fy)
        + tap(y0i, x0i + 1) * fx * (1 - fy)
        + tap(y0i + 1, x0i) * (1 - fx) * fy
        + tap(y0i + 1, x0i + 1) * fx * fy
    )
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
