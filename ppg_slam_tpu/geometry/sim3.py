"""Sim(3) similarity transforms (s, R, t) — used by loop closure.

Counterpart of the reference's Sim3 template (/root/reference/sensors/include/
SE3.h:141-293) and the g2o Sim3 vertex (G2oVertex.h:446-478). y = s * R @ x + t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import so3
from .se3 import SE3


class Sim3(NamedTuple):
    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)
    s: jax.Array  # (...,) scalar scale

    @staticmethod
    def identity(dtype=jnp.float32, batch: tuple = ()) -> "Sim3":
        return Sim3(
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
            jnp.zeros(batch + (3,), dtype=dtype),
            jnp.ones(batch, dtype=dtype),
        )

    @staticmethod
    def from_se3(T: SE3, s=None) -> "Sim3":
        scale = jnp.ones(T.t.shape[:-1], T.t.dtype) if s is None else jnp.asarray(s)
        return Sim3(T.R, T.t, scale)

    def to_se3(self) -> SE3:
        """SE3 recovery [sR t] -> [R t/s] (reference OptimizerGraph.cpp:264-278)."""
        return SE3(self.R, self.t / self.s[..., None])

    def apply(self, x: jax.Array) -> jax.Array:
        return (
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, x) + self.t
        )

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            self.R @ other.R,
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, other.t)
            + self.t,
            self.s * other.s,
        )

    def __matmul__(self, other: "Sim3") -> "Sim3":
        return self.compose(other)

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        sinv = 1.0 / self.s
        return Sim3(
            Rt, -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t), sinv
        )

    @staticmethod
    def exp(xi: jax.Array) -> "Sim3":
        """Tangent (..., 7) = [rho(3), phi(3), sigma(1)] -> Sim3.

        Standard closed form (Strasdat): t = W @ rho with
        W = A*hat(phi) + B*hat(phi)^2 + C*I, branch-free over the four
        small-angle/small-scale cases.
        """
        rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
        R = so3.exp(phi)
        s = jnp.exp(sigma)
        theta = jnp.linalg.norm(phi, axis=-1)
        Om = so3.hat(phi)
        Om2 = Om @ Om
        eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)

        eps = 1e-5
        sig_small = jnp.abs(sigma) < eps
        th_small = theta < eps
        sg = jnp.where(sig_small, 1.0, sigma)  # safe sigma
        th = jnp.where(th_small, 1.0, theta)  # safe theta
        th2 = th * th

        C = jnp.where(sig_small, 1.0, (s - 1.0) / sg)

        # theta small branches
        A_ts_ss = 0.5  # theta small, sigma small
        B_ts_ss = 1.0 / 6.0
        A_ts = ((sg - 1.0) * s + 1.0) / (sg * sg)
        B_ts = (s * (0.5 * sg * sg + 1.0) - 1.0 - sg * s) / (sg * sg * sg)

        # theta generic branches
        A_ss = (1.0 - jnp.cos(th)) / th2
        B_ss = (th - jnp.sin(th)) / (th2 * th)
        a = s * jnp.sin(th)
        b = s * jnp.cos(th)
        c = th2 + sg * sg
        A_g = (a * sg + (1.0 - b) * th) / (th * c)
        B_g = (C - ((b - 1.0) * sg + a * th) / c) / th2

        A = jnp.where(
            th_small,
            jnp.where(sig_small, A_ts_ss, A_ts),
            jnp.where(sig_small, A_ss, A_g),
        )
        B = jnp.where(
            th_small,
            jnp.where(sig_small, B_ts_ss, B_ts),
            jnp.where(sig_small, B_ss, B_g),
        )
        W = A[..., None, None] * Om + B[..., None, None] * Om2 + C[..., None, None] * eye
        return Sim3(R, jnp.einsum("...ij,...j->...i", W, rho), s)

    def log(self) -> jax.Array:
        """Inverse of exp: Sim3 -> (..., 7) tangent [rho, phi, sigma]."""
        phi = so3.log(self.R)
        sigma = jnp.log(self.s)
        theta = jnp.linalg.norm(phi, axis=-1)
        Om = so3.hat(phi)
        Om2 = Om @ Om
        eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), self.R.shape)

        eps = 1e-5
        sig_small = jnp.abs(sigma) < eps
        th_small = theta < eps
        sg = jnp.where(sig_small, 1.0, sigma)
        th = jnp.where(th_small, 1.0, theta)
        th2 = th * th
        s = self.s

        C = jnp.where(sig_small, 1.0, (s - 1.0) / sg)
        A = jnp.where(
            th_small,
            jnp.where(sig_small, 0.5, ((sg - 1.0) * s + 1.0) / (sg * sg)),
            jnp.where(
                sig_small,
                (1.0 - jnp.cos(th)) / th2,
                (s * jnp.sin(th) * sg + (1.0 - s * jnp.cos(th)) * th)
                / (th * (th2 + sg * sg)),
            ),
        )
        B = jnp.where(
            th_small,
            jnp.where(
                sig_small,
                1.0 / 6.0,
                (s * (0.5 * sg * sg + 1.0) - 1.0 - sg * s) / (sg * sg * sg),
            ),
            jnp.where(
                sig_small,
                (th - jnp.sin(th)) / (th2 * th),
                (C - ((s * jnp.cos(th) - 1.0) * sg + s * jnp.sin(th) * th)
                 / (th2 + sg * sg)) / th2,
            ),
        )
        W = A[..., None, None] * Om + B[..., None, None] * Om2 + C[..., None, None] * eye
        rho = jnp.linalg.solve(W, self.t[..., None])[..., 0]
        return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
