"""IMU initialization optimizers: gravity direction, scale, biases, velocities.

TPU equivalents of the two InertialOptimization overloads
(/root/reference/optimizing/src/OptimizerInertial.cpp):
  * full init (:174-378): poses fixed; per-KF velocities + one shared gyro/acc
    bias + 2-DOF gravity direction + log-scale optimized through the
    EdgeInertialGS chain (G2oEdge.cpp EdgeInertialGS::computeError) with bias
    priors (weights priorG/priorA), LM (lambda0 = 1e3 when priorG != 0).
  * scale refinement (:29-152): only gravity direction + scale free.

One jitted LM solve over the dense [v(3N), bg(3), ba(3), gdir(2), logs(1)]
system — a few hundred DOF, solved with one Cholesky per iteration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..imu.preintegration import GRAVITY_VALUE


class InertialInitProblem(NamedTuple):
    """Per-link preintegration payload (padded)."""

    kf1: jax.Array   # (L,) int32
    kf2: jax.Array   # (L,)
    dR: jax.Array    # (L, 3, 3)
    dV: jax.Array    # (L, 3)
    dP: jax.Array    # (L, 3)
    JRg: jax.Array   # (L, 3, 3)
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    b0: jax.Array    # (L, 6)
    sqi: jax.Array   # (L, 9, 9)
    dt: jax.Array    # (L,)
    valid: jax.Array # (L,)


def _gs_residual(dv1, dv2, bg_abs, ba_abs, dgd, ds, R1, t1, v1, R2, t2, v2,
                 Rwg, log_s, link: tuple):
    """EdgeInertialGS residual; bg_abs/ba_abs are the absolute shared biases
    (the caller adds its deltas before passing, so jacfwd differentiates
    through them)."""
    (dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, dt) = link
    dbg_c = bg_abs - b0[:3]
    dba_c = ba_abs - b0[3:]
    dR = dRm @ so3.exp(JRg @ dbg_c)
    dV = dVm + JVg @ dbg_c + JVa @ dba_c
    dP = dPm + JPg @ dbg_c + JPa @ dba_c

    gI = jnp.array([0.0, 0.0, -GRAVITY_VALUE], R1.dtype)
    Rwg_n = Rwg @ so3.exp(jnp.concatenate([dgd, jnp.zeros(1, R1.dtype)]))
    g = Rwg_n @ gI
    s = jnp.exp(log_s + ds)

    v1n = v1 + dv1
    v2n = v2 + dv2
    er = so3.log(dR.T @ R1.T @ R2)
    ev = R1.T @ (s * (v2n - v1n) - g * dt) - dV
    ep = R1.T @ (s * (t2 - t1 - v1n * dt) - 0.5 * g * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


@functools.partial(jax.jit, static_argnames=("fix_vel_bias", "iters"))
def inertial_optimization(
    R: jax.Array, t: jax.Array, v: jax.Array,
    bg0: jax.Array, ba0: jax.Array, Rwg0: jax.Array, scale0: jax.Array,
    prob: InertialInitProblem, prior_g: float, prior_a: float,
    fix_vel_bias: bool = False, iters: int = 40,
):
    """Returns (v, bg, ba, Rwg, scale).

    R/t/v: (N,3,3)/(N,3)/(N,3) fixed poses + initial velocities; bg0/ba0: (3,)
    shared bias inits; fix_vel_bias=True gives the scale-refinement variant.
    """
    dtype = t.dtype
    n = t.shape[0]
    L = prob.kf1.shape[0]
    n_dof = 3 * n + 9  # v..., bg, ba, gdir(2), logs(1)
    # priors are runtime scalars (every IMU-init phase shares one program);
    # cast so Python floats can't promote the solve under x64 test mode
    prior_g = jnp.asarray(prior_g, dtype)
    prior_a = jnp.asarray(prior_a, dtype)
    lam0_raw = jnp.where(prior_g != 0.0, 1e3, 1e-5).astype(dtype)

    # Global information normalization: clean/low-noise IMU gives sqrt-info
    # factors ~1e3-1e4, so the whitened chi2 sits at ~1e5-1e6 where f32
    # cannot resolve the LM accept test's descent (observed: every step
    # "rejected" and the init frozen at its seed). Scaling EVERY chi2 term
    # by one global alpha^2 (links by alpha, priors by alpha^2) preserves
    # the optimum exactly while bringing chi2 to O(#residuals).
    diag_mag = jnp.abs(jnp.diagonal(prob.sqi, axis1=1, axis2=2))
    w_valid = prob.valid.astype(dtype)[:, None]
    mean_sqi = jnp.sum(diag_mag * w_valid) / jnp.maximum(
        jnp.sum(w_valid) * 9.0, 1.0)
    alpha = 1.0 / jnp.maximum(mean_sqi, 1.0)
    prob = prob._replace(sqi=prob.sqi * alpha)
    prior_g = prior_g * alpha * alpha
    prior_a = prior_a * alpha * alpha
    # the initial LM damping must scale with the normalized Hessian too:
    # H shrinks by alpha^2, so an un-scaled lam0 (1e3 for the priorG!=0
    # init variant) would over-damp the first ~20 of 40 iterations
    # (lam only halves per accepted step) and leave the init near-frozen
    lam0 = lam0_raw * alpha * alpha

    def unpack(x, vels, bg, ba, Rwg, log_s):
        dvs = x[: 3 * n].reshape(n, 3)
        dbg = x[3 * n: 3 * n + 3]
        dba = x[3 * n + 3: 3 * n + 6]
        dgd = x[3 * n + 6: 3 * n + 8]
        ds = x[3 * n + 8]
        return dvs, dbg, dba, dgd, ds

    def link_res_jac(vels, bg, ba, Rwg, log_s):
        def one(k1, k2, dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, sqi, dt_):
            link = (dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, dt_)

            def f(dv1, dv2, dbg, dba, dgd, ds):
                return sqi @ _gs_residual(
                    dv1, dv2, bg + dbg, ba + dba, dgd, ds,
                    R[k1], t[k1], vels[k1], R[k2], t[k2], vels[k2],
                    Rwg, log_s, link)

            z3 = jnp.zeros(3, dtype)
            z2 = jnp.zeros(2, dtype)
            z1 = jnp.zeros((), dtype)
            r = f(z3, z3, z3, z3, z2, z1)
            Js = jax.jacfwd(f, argnums=(0, 1, 2, 3, 4, 5))(
                z3, z3, z3, z3, z2, z1)
            return r, Js

        return jax.vmap(one)(
            prob.kf1, prob.kf2, prob.dR, prob.dV, prob.dP, prob.JRg,
            prob.JVg, prob.JVa, prob.JPg, prob.JPa, prob.b0, prob.sqi,
            prob.dt)

    def assemble(vels, bg, ba, Rwg, log_s):
        r, (Jv1, Jv2, Jbg, Jba, Jgd, Jds) = link_res_jac(vels, bg, ba, Rwg,
                                                         log_s)
        w = prob.valid.astype(dtype)
        r = r * w[:, None]
        chi2 = jnp.sum(r * r)
        # stack per-link J into (L, 9, n_dof) via scatter on column blocks
        J = jnp.zeros((L, 9, n_dof), dtype)
        cols1 = (prob.kf1 * 3)[:, None, None] + jnp.arange(3)[None, None, :]
        cols2 = (prob.kf2 * 3)[:, None, None] + jnp.arange(3)[None, None, :]
        rows = jnp.arange(9)[None, :, None]
        J = J.at[jnp.arange(L)[:, None, None], rows, cols1].add(Jv1)
        J = J.at[jnp.arange(L)[:, None, None], rows, cols2].add(Jv2)
        J = J.at[:, :, 3 * n: 3 * n + 3].add(Jbg)
        J = J.at[:, :, 3 * n + 3: 3 * n + 6].add(Jba)
        J = J.at[:, :, 3 * n + 6: 3 * n + 8].add(Jgd)
        J = J.at[:, :, 3 * n + 8].add(Jds)
        J = J * w[:, None, None]
        H = jnp.einsum("ldi,ldj->ij", J, J)
        b = jnp.einsum("ldi,ld->i", J, r)
        # bias priors: r = bg * sqrt(priorG) etc.
        H = H.at[3 * n: 3 * n + 3, 3 * n: 3 * n + 3].add(
            prior_g * jnp.eye(3, dtype=dtype))
        H = H.at[3 * n + 3: 3 * n + 6, 3 * n + 3: 3 * n + 6].add(
            prior_a * jnp.eye(3, dtype=dtype))
        b = b.at[3 * n: 3 * n + 3].add(prior_g * bg)
        b = b.at[3 * n + 3: 3 * n + 6].add(prior_a * ba)
        chi2 += prior_g * jnp.sum(bg * bg) + prior_a * jnp.sum(ba * ba)
        return chi2, H, b

    free = jnp.ones((n_dof,), bool)
    if fix_vel_bias:
        free = free.at[: 3 * n + 6].set(False)

    def step(carry, _):
        vels, bg, ba, Rwg, log_s, lam = carry
        chi2, H, b = assemble(vels, bg, ba, Rwg, log_s)
        H = H + lam * jnp.eye(n_dof, dtype=dtype)
        H = jnp.where(free[:, None] & free[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free, 0.0, 1.0))
        b = jnp.where(free, b, 0.0)
        dx = -jnp.linalg.solve(H, b)
        dvs, dbg, dba, dgd, ds = unpack(dx, vels, bg, ba, Rwg, log_s)
        vels_n = vels + dvs
        bg_n = bg + dbg
        ba_n = ba + dba
        Rwg_n = so3.normalize(
            Rwg @ so3.exp(jnp.concatenate([dgd, jnp.zeros(1, dtype)])))
        log_s_n = log_s + ds
        chi2_n, _, _ = assemble(vels_n, bg_n, ba_n, Rwg_n, log_s_n)
        ok = chi2_n < chi2
        sel = lambda a, b_: jnp.where(ok, a, b_)
        return (sel(vels_n, vels), sel(bg_n, bg), sel(ba_n, ba),
                sel(Rwg_n, Rwg), sel(log_s_n, log_s),
                jnp.where(ok, lam * 0.5, lam * 5.0)), chi2

    init = (v, bg0, ba0, Rwg0, jnp.log(scale0), jnp.asarray(lam0, dtype))
    (vf, bgf, baf, Rwgf, log_sf, _), hist = jax.lax.scan(
        step, init, None, length=iters)
    return vf, bgf, baf, Rwgf, jnp.exp(log_sf), hist
