"""Pose-graph optimizers: Sim3 essential graph, 4-DoF variant, loop Sim3.

TPU equivalents of /root/reference/optimizing/src/OptimizerGraph.cpp:
  * optimize_essential_graph (:31-353): Sim3 vertices (Scw), relative-Sim3
    edges (loop connections / loop edges / covisibility w>=100 / temporal
    chain — the CALLER selects the edge set), identity information, LM
    lambda0=1e-16, 20 iterations, loop KF fixed.
  * optimize_essential_graph_4dof (:638-962): yaw+translation vertices,
    Edge4DoF relative-pose residual with rotation rows weighted 1e3.
  * optimize_sim3 (:355-636): relative Sim3 between two KFs from paired
    forward/inverse projections, Huber(sqrt th2), 5 its -> outlier removal ->
    10 more its, returns inlier count.

Everything dense-batched: residuals vmapped over edges, one Cholesky per LM
iteration on the (7N) / (4N) system.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..geometry.cameras import CameraModel
from ..geometry.sim3 import Sim3
from .robust import huber_weight


class Sim3Graph(NamedTuple):
    """Edge set for the essential graph (padded)."""

    i: jax.Array       # (E,) int32 vertex indices
    j: jax.Array       # (E,)
    Sji_R: jax.Array   # (E, 3, 3) measured relative Sim3 (j <- i)
    Sji_t: jax.Array   # (E, 3)
    Sji_s: jax.Array   # (E,)
    valid: jax.Array   # (E,)


def _sim3_error(di, dj, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """log(Sji ∘ (exp(di) Si) ∘ (exp(dj) Sj)^-1): zero when Sj Si^-1 == Sji.

    Vertices hold Scw; the g2o Sim3 vertex oplus is left-multiplicative
    exp(delta) ∘ S."""
    Si = Sim3.exp(di) @ Sim3(Ri, ti, si)
    Sj = Sim3.exp(dj) @ Sim3(Rj, tj, sj)
    err = Sim3(Rm, tm, sm) @ Si @ Sj.inverse()
    return err.log()


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_essential_graph(R: jax.Array, t: jax.Array, s: jax.Array,
                             graph: Sim3Graph, fixed: jax.Array,
                             iters: int = 20, fix_scale: bool = False):
    """R/t/s: (N,3,3)/(N,3)/(N,) Sim3 Scw vertices; fixed: (N,) bool.

    Returns optimized (R, t, s)."""
    dtype = t.dtype
    n = t.shape[0]
    n_dof = 7 * n
    z7 = jnp.zeros(7, dtype)

    free = ~fixed
    dof = jnp.repeat(free, 7)
    if fix_scale:
        scale_col = (jnp.arange(n_dof) % 7) == 6
        dof = dof & ~scale_col

    def assemble(Rc, tc, sc):
        def one(ei, ej, Rm, tm, sm):
            args = (Rc[ei], tc[ei], sc[ei], Rc[ej], tc[ej], sc[ej], Rm, tm, sm)
            r = _sim3_error(z7, z7, *args)
            Ji, Jj = jax.jacfwd(_sim3_error, argnums=(0, 1))(z7, z7, *args)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(one)(graph.i, graph.j, graph.Sji_R, graph.Sji_t,
                                  graph.Sji_s)
        w = graph.valid.astype(dtype)
        r = r * w[:, None]
        Ji = Ji * w[:, None, None]
        Jj = Jj * w[:, None, None]
        chi2 = jnp.sum(r * r)

        H = jnp.zeros((n, 7, n, 7), dtype)
        b = jnp.zeros((n, 7), dtype)
        H = H.at[graph.i, :, graph.i, :].add(jnp.einsum("edi,edj->eij", Ji, Ji))
        H = H.at[graph.j, :, graph.j, :].add(jnp.einsum("edi,edj->eij", Jj, Jj))
        H = H.at[graph.i, :, graph.j, :].add(jnp.einsum("edi,edj->eij", Ji, Jj))
        H = H.at[graph.j, :, graph.i, :].add(jnp.einsum("edi,edj->eij", Jj, Ji))
        b = b.at[graph.i].add(jnp.einsum("edi,ed->ei", Ji, r))
        b = b.at[graph.j].add(jnp.einsum("edi,ed->ei", Jj, r))
        return chi2, H.reshape(n_dof, n_dof), b.reshape(n_dof)

    def retract(Rc, tc, sc, dx):
        d = dx.reshape(n, 7)
        Sd = Sim3.exp(d)
        Snew = Sd @ Sim3(Rc, tc, sc)
        return so3.normalize(Snew.R), Snew.t, Snew.s

    def step(carry, _):
        Rc, tc, sc, lam = carry
        chi2, H, b = assemble(Rc, tc, sc)
        H = H + lam * jnp.eye(n_dof, dtype=dtype)
        H = jnp.where(dof[:, None] & dof[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(dof, 0.0, 1.0))
        b = jnp.where(dof, b, 0.0)
        dx = -jnp.linalg.solve(H, b)
        Rn, tn, sn = retract(Rc, tc, sc, dx)
        chi2_n, _, _ = assemble(Rn, tn, sn)
        ok = chi2_n < chi2
        sel = lambda a, b_: jnp.where(ok, a, b_)
        return (sel(Rn, Rc), sel(tn, tc), sel(sn, sc),
                jnp.where(ok, lam * 0.5, lam * 10.0)), chi2

    init = (R, t, s, jnp.asarray(1e-16, dtype))
    (Rf, tf, sf, _), _ = jax.lax.scan(step, init, None, length=iters)
    return Rf, tf, sf


class Graph4DoF(NamedTuple):
    i: jax.Array      # (E,)
    j: jax.Array      # (E,)
    dRij: jax.Array   # (E, 3, 3) measured Ti<-j rotation (camera convention)
    dtij: jax.Array   # (E, 3)
    valid: jax.Array  # (E,)


def _pose4_error(di, dj, Rwbi, twbi, Rwbj, twbj, dRij, dtij, rot_w):
    """Edge4DoF residual (G2oEdge.cpp Edge4DoF::computeError) with the
    reference's world-frame yaw+translation update (UpdateW)."""

    def upd(d, Rwb, twb):
        dyaw = jnp.concatenate([jnp.zeros(2, d.dtype), d[:1]])
        DR = so3.exp(dyaw)
        return DR @ Rwb, twb + d[1:4]

    Ri_w, ti_w = upd(di, Rwbi, twbi)
    Rj_w, tj_w = upd(dj, Rwbj, twbj)
    # camera(=body here) world-to-cam
    Ri = Ri_w.T
    ti = -Ri @ ti_w
    Rj = Rj_w.T
    tj = -Rj @ tj_w
    er = so3.log(Ri @ Rj.T @ dRij.T) * rot_w
    et = Ri @ (-Rj.T @ tj) + ti - dtij
    return jnp.concatenate([er, et])


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_essential_graph_4dof(Rwb: jax.Array, twb: jax.Array,
                                  graph: Graph4DoF, fixed: jax.Array,
                                  iters: int = 20):
    """4-DoF pose graph (yaw + translation; preserves IMU roll/pitch).
    Rotation rows weighted sqrt(1e3) (OptimizerGraph.cpp:715-718)."""
    dtype = twb.dtype
    n = twb.shape[0]
    n_dof = 4 * n
    rot_w = jnp.sqrt(jnp.asarray(1e3, dtype))
    z4 = jnp.zeros(4, dtype)
    dof = jnp.repeat(~fixed, 4)

    def assemble(Rc, tc):
        def one(ei, ej, dRij, dtij):
            args = (Rc[ei], tc[ei], Rc[ej], tc[ej], dRij, dtij, rot_w)
            r = _pose4_error(z4, z4, *args)
            Ji, Jj = jax.jacfwd(_pose4_error, argnums=(0, 1))(z4, z4, *args)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(one)(graph.i, graph.j, graph.dRij, graph.dtij)
        w = graph.valid.astype(dtype)
        r = r * w[:, None]
        Ji = Ji * w[:, None, None]
        Jj = Jj * w[:, None, None]
        chi2 = jnp.sum(r * r)
        H = jnp.zeros((n, 4, n, 4), dtype)
        b = jnp.zeros((n, 4), dtype)
        H = H.at[graph.i, :, graph.i, :].add(jnp.einsum("edi,edj->eij", Ji, Ji))
        H = H.at[graph.j, :, graph.j, :].add(jnp.einsum("edi,edj->eij", Jj, Jj))
        H = H.at[graph.i, :, graph.j, :].add(jnp.einsum("edi,edj->eij", Ji, Jj))
        H = H.at[graph.j, :, graph.i, :].add(jnp.einsum("edi,edj->eij", Jj, Ji))
        b = b.at[graph.i].add(jnp.einsum("edi,ed->ei", Ji, r))
        b = b.at[graph.j].add(jnp.einsum("edi,ed->ei", Jj, r))
        return chi2, H.reshape(n_dof, n_dof), b.reshape(n_dof)

    def step(carry, _):
        Rc, tc, lam = carry
        chi2, H, b = assemble(Rc, tc)
        H = H + lam * jnp.eye(n_dof, dtype=dtype)
        H = jnp.where(dof[:, None] & dof[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(dof, 0.0, 1.0))
        b = jnp.where(dof, b, 0.0)
        dx = -jnp.linalg.solve(H, b).reshape(n, 4)
        dyaw = jnp.concatenate([jnp.zeros((n, 2), dtype), dx[:, :1]], 1)
        Rn = so3.normalize(so3.exp(dyaw) @ Rc)
        tn = tc + dx[:, 1:4]
        chi2_n, _, _ = assemble(Rn, tn)
        ok = chi2_n < chi2
        sel = lambda a, b_: jnp.where(ok, a, b_)
        return (sel(Rn, Rc), sel(tn, tc),
                jnp.where(ok, lam * 0.5, lam * 10.0)), chi2

    init = (Rwb, twb, jnp.asarray(1e-16, dtype))
    (Rf, tf, _), _ = jax.lax.scan(step, init, None, length=iters)
    return Rf, tf


def _sim3_proj_residuals(d, S_R, S_t, S_s, X1, X2, uv1, uv2,
                         cam1: CameraModel, cam2: CameraModel,
                         fix_scale: bool):
    """Paired forward/inverse Sim3 projection residuals (OptimizeSim3).
    X1: points in camera-1 frame; X2: in camera-2 frame. S maps 2 -> 1."""
    if fix_scale:
        d = d.at[6].set(0.0)
    S = Sim3.exp(d) @ Sim3(S_R, S_t, S_s)
    r12 = uv1 - cam1.project(S.apply(X2))
    r21 = uv2 - cam2.project(S.inverse().apply(X1))
    return r12, r21


@functools.partial(jax.jit, static_argnames=("fix_scale", "th2"))
def optimize_sim3(S_R, S_t, S_s, X1, X2, uv1, uv2, valid,
                  cam1: CameraModel, cam2: CameraModel,
                  fix_scale: bool = False, th2: float = 10.0):
    """Returns (S12 R/t/s, inlier mask, n_inliers).

    X1/X2: (M, 3) matched map points in each camera frame; uv1/uv2 their
    observed pixels in the opposite image. 5 robust its -> outlier cut ->
    10 more its (:544-605)."""
    dtype = S_t.dtype
    z7 = jnp.zeros(7, dtype)
    delta = jnp.sqrt(jnp.asarray(th2, dtype))

    def gn(SR, St, Ss, active, n_iters, kernel=True):
        def body(carry, _):
            R_, t_, s_, lam = carry

            def one(x1, x2, u1, u2):
                r12, r21 = _sim3_proj_residuals(
                    z7, R_, t_, s_, x1, x2, u1, u2, cam1, cam2, fix_scale)
                J12, J21 = jax.jacfwd(
                    lambda dd: _sim3_proj_residuals(
                        dd, R_, t_, s_, x1, x2, u1, u2, cam1, cam2, fix_scale)
                )(z7)
                return r12, r21, J12, J21

            r12, r21, J12, J21 = jax.vmap(one)(X1, X2, uv1, uv2)
            chi12 = jnp.sum(r12 * r12, 1)
            chi21 = jnp.sum(r21 * r21, 1)
            if kernel:
                w12 = huber_weight(chi12, delta)
                w21 = huber_weight(chi21, delta)
            else:
                w12 = jnp.ones_like(chi12)
                w21 = jnp.ones_like(chi21)
            w12 = w12 * active
            w21 = w21 * active
            H = (jnp.einsum("m,mdi,mdj->ij", w12, J12, J12)
                 + jnp.einsum("m,mdi,mdj->ij", w21, J21, J21))
            g = (jnp.einsum("m,mdi,md->i", w12, J12, r12)
                 + jnp.einsum("m,mdi,md->i", w21, J21, r21))
            cost = jnp.sum(active * (chi12 + chi21))
            H = H + lam * jnp.eye(7, dtype=dtype)
            dx = -jnp.linalg.solve(H, g)
            Sn = Sim3.exp(dx) @ Sim3(R_, t_, s_)
            Rn, tn, sn = so3.normalize(Sn.R), Sn.t, Sn.s
            if fix_scale:
                sn = s_

            def cost_at(Ra, ta, sa):
                r12a, r21a = jax.vmap(
                    lambda x1, x2, u1, u2: _sim3_proj_residuals(
                        z7, Ra, ta, sa, x1, x2, u1, u2, cam1, cam2, fix_scale)
                )(X1, X2, uv1, uv2)
                return jnp.sum(active * (jnp.sum(r12a**2, 1)
                                         + jnp.sum(r21a**2, 1)))

            ok = cost_at(Rn, tn, sn) < cost
            sel = lambda a, b_: jnp.where(ok, a, b_)
            return (sel(Rn, R_), sel(tn, t_), sel(sn, s_),
                    jnp.where(ok, lam * 0.5, lam * 5.0)), None

        (Rf, tf, sf, _), _ = jax.lax.scan(
            body, (SR, St, Ss, jnp.asarray(1e-5, dtype)), None,
            length=n_iters)
        return Rf, tf, sf

    active = valid.astype(dtype)
    R1, t1, s1 = gn(S_R, S_t, S_s, active, 5)

    def chi_at(Ra, ta, sa):
        r12a, r21a = jax.vmap(
            lambda x1, x2, u1, u2: _sim3_proj_residuals(
                z7, Ra, ta, sa, x1, x2, u1, u2, cam1, cam2, fix_scale)
        )(X1, X2, uv1, uv2)
        return jnp.sum(r12a**2, 1), jnp.sum(r21a**2, 1)

    chi12, chi21 = chi_at(R1, t1, s1)
    inlier = valid & (chi12 <= th2) & (chi21 <= th2)
    R2, t2, s2 = gn(R1, t1, s1, inlier.astype(dtype), 10)
    chi12, chi21 = chi_at(R2, t2, s2)
    inlier = valid & (chi12 <= th2) & (chi21 <= th2)
    return R2, t2, s2, inlier, jnp.sum(inlier)
