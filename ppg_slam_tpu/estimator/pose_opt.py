"""Per-frame pose optimization — the tracking hot path.

TPU equivalents of /root/reference/optimizing/src/OptimizerPose.cpp:
  * pose_optimization:       PoseOptimization (:26-160) — pose-only LM on Tcw,
    4 rounds x 10 its, Huber(sqrt 5.991) dropped after round 3, chi2-based
    inlier reclassification each round, pose reset to the initial estimate at
    the start of every round (the reference re-seeds vSE3 from the unchanged
    frame pose, :108-110).
  * pose_inertial_optimization: PoseInertialOptimizationLastFrame/LastKeyFrame
    (:177-466, :484-) — dense GN over the 15-D states of the current and
    previous frame (prev fixed for the LastKeyFrame variant), with the 9-D
    preintegration residual, bias random walks, the 15-D marginalization
    prior, depth-aware chi2 thresholds, a <30-inlier recovery pass, and
    Schur marginalization of the previous state into a new 15-D prior.

Single jitted calls: fixed 4x10 iteration structure, padded observation
buffers, all classification device-side.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..geometry.cameras import CameraModel
from .ba_core import (
    DOF,
    S_BA,
    S_BG,
    S_V,
    inertial_residual,
    prior15_residual,
)
from .robust import huber_weight

CHI2_MONO = 5.991
HUBER_MONO = 2.447574  # sqrt(5.991)


# ---------------------------------------------------------------------------
# visual-only pose optimization (g2o VertexSE3Expmap convention: left-mult
# update on Tcw)
# ---------------------------------------------------------------------------

def _reproj_tcw(d6, Rcw, tcw, X, uv, cam: CameraModel):
    dR = so3.exp(d6[:3])
    Rn = dR @ Rcw
    tn = dR @ tcw + d6[3:]
    return uv - cam.project(Rn @ X + tn)


@functools.partial(jax.jit)  # cam is a runtime pytree (shared program across calibrations)
def pose_optimization(Rcw0, tcw0, X, uv, valid, cam: CameraModel):
    """Returns (Rcw, tcw, inlier (O,), n_inliers). X: (O, 3) world points."""
    dtype = tcw0.dtype
    O = X.shape[0]

    def res_jac(Rcw, tcw):
        def one(Xo, uvo):
            z = jnp.zeros(6, dtype)
            r = _reproj_tcw(z, Rcw, tcw, Xo, uvo, cam)
            J = jax.jacfwd(_reproj_tcw, argnums=0)(z, Rcw, tcw, Xo, uvo, cam)
            return r, J

        return jax.vmap(one)(X, uv)

    def lm_round(Rcw, tcw, active, use_kernel, iters=10):
        def it_body(carry, _):
            Rc, tc, lam, last = carry
            r, J = res_jac(Rc, tc)
            chi2 = jnp.sum(r * r, axis=1)
            w = jnp.where(use_kernel, huber_weight(chi2, HUBER_MONO), 1.0)
            w = w * active
            H = jnp.einsum("o,odi,odj->ij", w, J, J)
            g = jnp.einsum("o,odi,od->i", w, J, r)
            cost = jnp.sum(jnp.where(active, chi2, 0.0))
            Hd = H + lam * jnp.eye(6, dtype=dtype)
            dx = -jnp.linalg.solve(Hd, g)
            dR = so3.exp(dx[:3])
            Rn = so3.normalize(dR @ Rc)
            tn = dR @ tc + dx[3:]
            # accept/reject
            rn, _ = res_jac(Rn, tn)
            chin = jnp.sum(rn * rn, axis=1)
            new_cost = jnp.sum(jnp.where(active, chin, 0.0))
            ok = new_cost < cost
            Rc = jnp.where(ok, Rn, Rc)
            tc = jnp.where(ok, tn, tc)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return (Rc, tc, lam, cost), None

        (Rf, tf, _, _), _ = jax.lax.scan(
            it_body, (Rcw, tcw, jnp.asarray(1e-5, dtype), jnp.inf), None,
            length=iters)
        return Rf, tf

    inlier = valid
    Rf, tf = Rcw0, tcw0
    for rnd in range(4):
        Rf, tf = lm_round(Rcw0, tcw0, inlier.astype(dtype),
                          use_kernel=(rnd < 3))
        r, _ = (lambda Rc, tc: (jax.vmap(
            lambda Xo, uvo: _reproj_tcw(jnp.zeros(6, dtype), Rc, tc, Xo, uvo,
                                        cam))(X, uv), None))(Rf, tf)
        chi2 = jnp.sum(r * r, axis=1)
        inlier = valid & (chi2 <= CHI2_MONO)
    return Rf, tf, inlier, jnp.sum(inlier)


# ---------------------------------------------------------------------------
# visual-inertial 2-frame pose optimization + marginalization
# ---------------------------------------------------------------------------

class FrameVIState(NamedTuple):
    R: jax.Array   # (3, 3) Rwb
    t: jax.Array   # (3,)
    v: jax.Array   # (3,)
    bg: jax.Array  # (3,)
    ba: jax.Array  # (3,)

    def retract(self, d):
        return FrameVIState(
            so3.normalize(self.R @ so3.exp(d[:3])),
            self.t + self.R @ d[3:6],
            self.v + d[S_V:S_BG], self.bg + d[S_BG:S_BA], self.ba + d[S_BA:])


class PreintData(NamedTuple):
    """Preintegration payload of one link (device-side mirror of
    Preintegrated)."""
    dR: jax.Array
    dV: jax.Array
    dP: jax.Array
    JRg: jax.Array
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    b0: jax.Array    # (6,)
    sqi: jax.Array   # (9, 9) sqrt information
    sqig: jax.Array  # (3, 3) gyro RW sqrt info
    sqia: jax.Array  # (3, 3) acc RW sqrt info
    dt: jax.Array    # ()


class Prior15(NamedTuple):
    """ConstraintPoseImu: linearization point + 15x15 Hessian."""
    R: jax.Array
    t: jax.Array
    v: jax.Array
    bg: jax.Array
    ba: jax.Array
    H: jax.Array      # (15, 15)
    valid: jax.Array  # () bool


def _mono_res_body(d, R, t, X, uv, Rcb, tcb, cam):
    Rn = R @ so3.exp(d[:3])
    tn = t + R @ d[3:6]
    Xc = Rcb @ (Rn.T @ (X - tn)) + tcb
    return uv - cam.project(Xc), Xc[2]


def _sqrtm_psd(H):
    """Symmetric PSD square root via eigendecomposition (for whitening)."""
    Hs = 0.5 * (H + H.T)
    w, V = jnp.linalg.eigh(Hs)
    w = jnp.maximum(w, 0.0)
    return (V * jnp.sqrt(w)[None, :]) @ V.T


def _jacobi_solve(H, g):
    """Solve H dx = g with Jacobi (diagonal) preconditioning: the 2-frame
    visual-inertial system mixes ~1e8-scale whitened-preintegration blocks
    with ~1e2-scale vision blocks, far beyond float32 solve conditioning;
    normalizing to unit diagonal keeps the solve stable."""
    d = jax.lax.rsqrt(jnp.clip(jnp.diag(H), 1e-12, None))
    Hn = H * d[:, None] * d[None, :]
    Hn = Hn + 1e-6 * jnp.eye(H.shape[0], dtype=H.dtype)
    y = jnp.linalg.solve(Hn, g * d)
    return y * d


def marginalize_schur(H, keep_start: int):
    """Reference Marginalize(H, 0, 14) (OptimizerInertial.cpp:380-...):
    Schur-complement the leading `keep_start` variables away using an SVD
    pseudo-inverse; returns the (30-keep_start) trailing block."""
    a = H[:keep_start, :keep_start]
    b = H[:keep_start, keep_start:]
    c = H[keep_start:, keep_start:]
    u, s, vt = jnp.linalg.svd(0.5 * (a + a.T))
    s_inv = jnp.where(s > 1e-6, 1.0 / jnp.where(s > 1e-6, s, 1.0), 0.0)
    a_pinv = (vt.T * s_inv[None, :]) @ u.T
    return c - b.T @ a_pinv @ b


@functools.partial(jax.jit, static_argnames=("fix_prev", "rec_init"))
def pose_inertial_optimization(
    curr: FrameVIState, prev: FrameVIState, preint: PreintData,
    prior: Prior15, X, uv, valid, close, Rcb, tcb, cam: CameraModel,
    fix_prev: bool = False, rec_init: bool = False,
):
    """Returns (curr', inlier mask, n_inliers, new Prior15 for curr').

    fix_prev=True reproduces PoseInertialOptimizationLastKeyFrame (previous
    state fixed, no prior edge); otherwise LastFrame (prev free + 15-D prior).
    """
    dtype = X.dtype
    z15 = jnp.zeros(DOF, dtype)

    def full_residuals(c: FrameVIState, p: FrameVIState, dc, dp):
        """Stacked whitened residual pieces given deltas (for jacfwd)."""
        # inertial (prev -> curr)
        ri = inertial_residual(
            dp, dc, p.R, p.t, p.v, p.bg, p.ba, c.R, c.t, c.v,
            preint.dR, preint.dV, preint.dP, preint.JRg, preint.JVg,
            preint.JVa, preint.JPg, preint.JPa, preint.b0, preint.dt)
        ri = preint.sqi @ ri
        # bias random walks
        rg = preint.sqig @ ((c.bg + dc[S_BG:S_BA]) - (p.bg + dp[S_BG:S_BA]))
        ra = preint.sqia @ ((c.ba + dc[S_BA:]) - (p.ba + dp[S_BA:]))
        # prior on prev
        rp = prior15_residual(dp, p.R, p.t, p.v, p.bg, p.ba,
                              prior.R, prior.t, prior.v, prior.bg, prior.ba)
        return ri, rg, ra, rp

    # cap the prior information spectrum: the KF-anchored marginal inherits
    # ~1/preint-cov information (1e7+ on clean IMU), which a float32 GN
    # cannot mix with ~1e2-scale vision blocks. sigma floors: 3e-4 (~0.3 mm /
    # 0.3 mm/s) -> max eigenvalue 1e7, still far tighter than any residual.
    _pw, _pV = jnp.linalg.eigh(0.5 * (prior.H + prior.H.T))
    _prior_H = (_pV * jnp.clip(_pw, 0.0, 1e7)[None, :]) @ _pV.T
    sq_prior = _sqrtm_psd(_prior_H) * prior.valid

    def gn_round(c, p, active, use_kernel, iters=10):
        def body(carry, _):
            cc, pp = carry
            # mono residuals + jacobians wrt current pose
            def mono_one(Xo, uvo):
                r, _ = _mono_res_body(z15[:6], cc.R, cc.t, Xo, uvo, Rcb, tcb,
                                      cam)
                J = jax.jacfwd(
                    lambda d: _mono_res_body(d, cc.R, cc.t, Xo, uvo, Rcb, tcb,
                                             cam)[0])(z15[:6])
                return r, J

            rm, Jm = jax.vmap(mono_one)(X, uv)
            chi2 = jnp.sum(rm * rm, axis=1)
            wm = jnp.where(use_kernel, huber_weight(chi2, HUBER_MONO), 1.0)
            wm = wm * active

            H = jnp.zeros((2 * DOF, 2 * DOF), dtype)
            g = jnp.zeros((2 * DOF,), dtype)
            # mono into current block [0:15] (pose columns only)
            Jm15 = jnp.pad(Jm, ((0, 0), (0, 0), (0, DOF - 6)))
            H = H.at[:DOF, :DOF].add(jnp.einsum("o,odi,odj->ij", wm, Jm15, Jm15))
            g = g.at[:DOF].add(jnp.einsum("o,odi,od->i", wm, Jm15, rm))

            # inertial + RW + prior via jacfwd over (dc, dp)
            def stacked(dc, dp):
                ri, rg, ra, rp = full_residuals(cc, pp, dc, dp)
                rp = sq_prior @ rp
                return jnp.concatenate([ri, rg, ra, rp])

            r_all = stacked(z15, z15)
            Jc, Jp = jax.jacfwd(stacked, argnums=(0, 1))(z15, z15)
            # prior robust kernel Huber(5.0) on its own chi2
            chi2p = jnp.sum(r_all[15:30] * r_all[15:30])
            wp = huber_weight(chi2p, 5.0) * prior.valid
            wvec = jnp.concatenate([
                jnp.ones(15, dtype),
                jnp.full((15,), wp, dtype),
            ])
            H = H.at[:DOF, :DOF].add(jnp.einsum("d,di,dj->ij", wvec, Jc, Jc))
            g = g.at[:DOF].add(jnp.einsum("d,di,d->i", wvec, Jc, r_all))
            if not fix_prev:
                H = H.at[DOF:, DOF:].add(
                    jnp.einsum("d,di,dj->ij", wvec, Jp, Jp))
                H = H.at[:DOF, DOF:].add(
                    jnp.einsum("d,di,dj->ij", wvec, Jc, Jp))
                H = H.at[DOF:, :DOF].add(
                    jnp.einsum("d,di,dj->ij", wvec, Jp, Jc))
                g = g.at[DOF:].add(jnp.einsum("d,di,d->i", wvec, Jp, r_all))
                dx = -_jacobi_solve(H, g)
                cc = cc.retract(dx[:DOF])
                pp = pp.retract(dx[DOF:])
            else:
                dx = -_jacobi_solve(H[:DOF, :DOF], g[:DOF])
                cc = cc.retract(dx)
            return (cc, pp), None

        (cf, pf), _ = jax.lax.scan(body, (c, p), None, length=iters)
        return cf, pf

    inlier = valid
    c, p = curr, prev
    for rnd in range(4):
        c, p = gn_round(c, p, inlier.astype(dtype), use_kernel=(rnd < 3))
        r, depth = jax.vmap(
            lambda Xo, uvo: _mono_res_body(z15[:6], c.R, c.t, Xo, uvo, Rcb,
                                           tcb, cam))(X, uv)
        chi2 = jnp.sum(r * r, axis=1)
        th = jnp.where(close, 1.5 * CHI2_MONO, CHI2_MONO)
        inlier = valid & (chi2 <= th) & (depth > 0)

    n_in = jnp.sum(inlier)

    # recovery pass: relaxed threshold 18.0 when < 30 inliers
    if not rec_init:
        r, depth = jax.vmap(
            lambda Xo, uvo: _mono_res_body(z15[:6], c.R, c.t, Xo, uvo, Rcb,
                                           tcb, cam))(X, uv)
        chi2 = jnp.sum(r * r, axis=1)
        relaxed = valid & (chi2 < 18.0)
        inlier = jnp.where(n_in < 30, relaxed, inlier)
        n_in = jnp.sum(inlier)

    # ---- marginalization: build 30x30 H at the final estimate -------------
    def stacked_final(dc, dp):
        ri, rg, ra, rp = full_residuals(c, p, dc, dp)
        rp = sq_prior @ rp
        return jnp.concatenate([ri, rg, ra, rp])

    Jc, Jp = jax.jacfwd(stacked_final, argnums=(0, 1))(z15, z15)
    # layout matches the reference: [prev(15), curr(15)]
    J30 = jnp.concatenate([Jp, Jc], axis=1)
    H30 = J30.T @ J30

    def mono_H(Xo, uvo, w):
        J = jax.jacfwd(
            lambda d: _mono_res_body(d, c.R, c.t, Xo, uvo, Rcb, tcb, cam)[0]
        )(z15[:6])
        return w * (J.T @ J)

    Hm = jnp.sum(jax.vmap(mono_H)(X, uv, inlier.astype(dtype)), axis=0)
    H30 = H30.at[DOF:DOF + 6, DOF:DOF + 6].add(Hm)

    H_new = marginalize_schur(H30, DOF)
    # PSD-project the marginal (the reference does the same in the
    # ConstraintPoseImu ctor, G2oEdge.h:350-403): Schur complements of
    # near-singular float32 systems come out slightly indefinite, and a
    # negative eigenvalue compounding through the frame-to-frame prior chain
    # eventually blows up the 2-frame GN (observed: velocity -> -8e3 m/s
    # after ~40 frames).
    H_sym = 0.5 * (H_new + H_new.T)
    w, V = jnp.linalg.eigh(H_sym)
    H_new = (V * jnp.clip(w, 0.0, None)[None, :]) @ V.T
    new_prior = Prior15(R=c.R, t=c.t, v=c.v, bg=c.bg, ba=c.ba, H=H_new,
                        valid=jnp.asarray(True))
    return c, inlier, n_in, new_prior
