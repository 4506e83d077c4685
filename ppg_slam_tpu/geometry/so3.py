"""SO(3) Lie-group operations, dtype-polymorphic and jit/vmap friendly.

Functional equivalents of the reference's SO3 utilities
(/root/reference/optimizing/include/G2oVertex.h:59-125 — ExpSO3, LogSO3,
RightJacobianSO3, InverseRightJacobianSO3, Skew, NormalizeRotation, and the
quaternion-backed SO3 template in /root/reference/sensors/include/SE3.h).

Rotations are plain (..., 3, 3) matrices; all functions broadcast over leading
axes, so they vmap/batch for free on TPU.

Array-module dispatch: every op runs on numpy when ALL inputs are host numpy
arrays/scalars, and on jax otherwise (tracers included). Host pipeline code
(motion model, loop closing, preintegration host helpers) calls these eagerly
per frame — the jax path there costs one XLA compile per new input shape
(~40 programs per tracked-map run, profiled on the 1-core CI host) plus a
device round trip per call on tunneled accelerators. Identical formulas both
ways; tests assert numerics, not backend.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _xp(*arrays):
    for a in arrays:
        if not isinstance(a, (np.ndarray, np.generic, float, int)):
            return jnp
    return np


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (..., 3) vector(s)."""
    xp = _xp(w)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = xp.zeros_like(wx)
    return xp.stack(
        [
            xp.stack([z, -wz, wy], axis=-1),
            xp.stack([wz, z, -wx], axis=-1),
            xp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (..., 3, 3) skew matrix -> (..., 3) vector."""
    xp = _xp(W)
    return xp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) for (..., 3) tangent vector(s).

    Uses the numerically-safe small-angle series for |w| -> 0 (second-order
    terms match the reference's ExpSO3 small-angle branch).
    """
    xp = _xp(w)
    theta2 = xp.sum(w * w, axis=-1)
    theta = xp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    small = theta < 1e-5
    # sin(t)/t and (1-cos t)/t^2 with safe denominators
    safe_t2 = xp.where(small, 1.0, theta2)
    a = xp.where(small, 1.0 - theta2 / 6.0, xp.sin(theta) / xp.sqrt(safe_t2))
    b = xp.where(small, 0.5 - theta2 / 24.0, (1.0 - xp.cos(theta)) / safe_t2)
    eye = xp.broadcast_to(xp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log(R: jax.Array) -> jax.Array:
    """Logarithm map SO(3) -> so(3) for (..., 3, 3) rotation(s).

    Mirrors the reference LogSO3 (G2oVertex.cpp): theta from trace, axis from
    the antisymmetric part, with a safe fallback near theta = pi where the
    antisymmetric part vanishes.
    """
    xp = _xp(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = xp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = xp.arccos(cos_theta)
    swap = np.swapaxes if xp is np else jnp.swapaxes
    w_skew = vee(R - swap(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_theta = xp.sin(theta)
    small = theta < 1e-5
    near_pi = sin_theta < 1e-5  # includes both theta~0 and theta~pi
    scale = xp.where(
        near_pi, 1.0, theta / xp.where(near_pi, 1.0, sin_theta)
    )
    w_generic = w_skew * scale[..., None]

    # theta ~ pi branch: axis from the symmetric part. R = I + 2*sin^2? Use
    # R + I = 2 * (axis axis^T) * (1 - cos) + ... => diag of (R+I)/2 gives axis^2.
    S = 0.5 * (R + swap(R, -1, -2))
    diag = xp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    axis2 = xp.clip((diag - cos_theta[..., None]) / xp.where(
        xp.abs(1.0 - cos_theta[..., None]) < _EPS, 1.0,
        1.0 - cos_theta[..., None]
    ), 0.0, 1.0)
    axis_abs = xp.sqrt(axis2)
    # Sign disambiguation from the largest off-diagonal products.
    sx = xp.sign(xp.where(xp.abs(w_skew[..., 0]) > _EPS, w_skew[..., 0], 1.0))
    # Use off-diagonal symmetric entries to fix relative signs: S_xy = ax*ay*(1-c)
    sxy = xp.sign(S[..., 0, 1])
    sxz = xp.sign(S[..., 0, 2])
    axis_pi = axis_abs * xp.stack(
        [xp.ones_like(sx), xp.where(sxy == 0, 1.0, sxy),
         xp.where(sxz == 0, 1.0, sxz)],
        axis=-1,
    ) * sx[..., None]
    w_pi = axis_pi * theta[..., None]

    use_pi = xp.logical_and(near_pi, xp.logical_not(small))
    return xp.where(use_pi[..., None], w_pi, w_generic)


def right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian Jr(w) of SO(3) (reference RightJacobianSO3)."""
    xp = _xp(w)
    theta2 = xp.sum(w * w, axis=-1)
    theta = xp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    small = theta < 1e-5
    safe_t2 = xp.where(small, 1.0, theta2)
    safe_t3 = safe_t2 * xp.sqrt(safe_t2)
    a = xp.where(small, 0.5 - theta2 / 24.0, (1.0 - xp.cos(theta)) / safe_t2)
    b = xp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - xp.sin(theta)) / safe_t3
    )
    eye = xp.broadcast_to(xp.eye(3, dtype=w.dtype), W.shape)
    return eye - a[..., None, None] * W + b[..., None, None] * W2


def inverse_right_jacobian(w: jax.Array) -> jax.Array:
    """Jr(w)^-1 (reference InverseRightJacobianSO3)."""
    xp = _xp(w)
    theta2 = xp.sum(w * w, axis=-1)
    theta = xp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    small = theta < 1e-5
    safe_t2 = xp.where(small, 1.0, theta2)
    c = xp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2
        - (1.0 + xp.cos(theta))
        / (2.0 * theta * xp.sin(theta) + xp.where(small, 1.0, 0.0)),
    )
    eye = xp.broadcast_to(xp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + c[..., None, None] * W2


def normalize(R: jax.Array, exact: bool = False) -> jax.Array:
    """Re-orthonormalize rotation matrices (reference NormalizeRotation).

    Host/numpy path: exact SVD polar factor (robust for arbitrary input).
    JAX path: two Newton–Schulz polar iterations — every traced caller
    feeds products of rotations (drift ~f32 roundoff, well inside the
    ||RᵀR − I|| < 1 convergence region), and jnp.linalg.svd lowers to a
    QDWH custom-call + while loop that was the single costliest op of the
    whole BA solve on TPU (profiled: ~3 ms/GN-iteration at 64 KFs).

    PRECONDITION (JAX path): input must be NEAR-ORTHOGONAL (all singular
    values in (0, sqrt(3)), det > 0). Newton–Schulz diverges outside that
    region and never repairs det=-1 — a genuinely noisy matrix (e.g. a
    rotation-averaging sum) gets silently wrong output. Pass exact=True
    to force the SVD polar factor under jit for such callers."""
    xp = _xp(R)
    if exact and xp is not np:
        u, _, vt = jnp.linalg.svd(R)
        det = jnp.linalg.det(u @ vt)
        u = u.at[..., :, 2].multiply(jnp.sign(det)[..., None])
        return u @ vt
    if xp is np:
        u, _, vt = np.linalg.svd(R)
        Rn = u @ vt
        det = np.linalg.det(Rn)
        u_fixed = u.copy()
        u_fixed[..., :, 2] *= np.sign(det)[..., None]
        return np.where((det > 0)[..., None, None], Rn, u_fixed @ vt)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(2):
        RtR = jnp.einsum("...ji,...jk->...ik", R, R)
        R = 0.5 * (R @ (3.0 * eye - RtR))
    return R


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) as (x, y, z, w) -> rotation matrix."""
    xp = _xp(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return xp.stack(
        [
            xp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
                     axis=-1),
            xp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
                     axis=-1),
            xp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
                     axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (x, y, z, w), branch-free."""
    xp = _xp(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick the numerically best
    qw = xp.sqrt(xp.clip(1.0 + tr, _EPS, None)) * 0.5
    qx = xp.sqrt(xp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    qy = xp.sqrt(xp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    qz = xp.sqrt(xp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    # Standard max-trace-component approach via where-chains:
    case0 = xp.stack([(m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw),
                      (m10 - m01) / (4 * qw), qw], axis=-1)
    case1 = xp.stack([qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx),
                      (m21 - m12) / (4 * qx)], axis=-1)
    case2 = xp.stack([(m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy),
                      (m02 - m20) / (4 * qy)], axis=-1)
    case3 = xp.stack([(m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz,
                      (m10 - m01) / (4 * qz)], axis=-1)
    c0 = (tr > m00) & (tr > m11) & (tr > m22)
    c1 = (m00 >= tr) & (m00 > m11) & (m00 > m22)
    c2 = (m11 >= tr) & (m11 >= m00) & (m11 > m22)
    q = xp.where(c0[..., None], case0,
                 xp.where(c1[..., None], case1,
                          xp.where(c2[..., None], case2, case3)))
    return q / xp.linalg.norm(q, axis=-1, keepdims=True)
