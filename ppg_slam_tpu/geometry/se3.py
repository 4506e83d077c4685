"""SE(3) rigid transforms as (R, t) array pairs — jit/vmap friendly.

Functional counterpart of the reference's quaternion-backed SE3 template
(/root/reference/sensors/include/SE3.h:69-140). We keep rotations as (..., 3, 3)
matrices and translations as (..., 3) vectors in a small pytree so transforms
batch over leading axes and live on device as SoA tensors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    """Rigid transform y = R @ x + t. Batchable over leading axes."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32, batch: tuple = ()) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
        t = jnp.zeros(batch + (3,), dtype=dtype)
        return SE3(R, t)

    def apply(self, x: jax.Array) -> jax.Array:
        """Transform points: (..., 3) -> (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: first apply `other`, then `self`."""
        return SE3(self.R @ other.R,
                   jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t)

    def __matmul__(self, other: "SE3") -> "SE3":
        return self.compose(other)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def matrix(self) -> jax.Array:
        """(..., 4, 4) homogeneous matrix."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), batch + (4,)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom[..., None, :]], axis=-2)

    def matrix3x4(self) -> jax.Array:
        return jnp.concatenate([self.R, self.t[..., None]], axis=-1)

    @staticmethod
    def from_matrix(T: jax.Array) -> "SE3":
        return SE3(T[..., :3, :3], T[..., :3, 3])

    @staticmethod
    def exp(xi: jax.Array) -> "SE3":
        """Exponential map se(3) -> SE(3); xi = (..., 6) as [rho, phi]."""
        rho, phi = xi[..., :3], xi[..., 3:]
        R = so3.exp(phi)
        # left Jacobian of SO3 = right_jacobian(-phi)
        V = so3.right_jacobian(-phi)
        return SE3(R, jnp.einsum("...ij,...j->...i", V, rho))

    def log(self) -> jax.Array:
        phi = so3.log(self.R)
        Vinv = so3.inverse_right_jacobian(-phi)
        rho = jnp.einsum("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([rho, phi], axis=-1)

    def normalized(self) -> "SE3":
        return SE3(so3.normalize(self.R), self.t)
