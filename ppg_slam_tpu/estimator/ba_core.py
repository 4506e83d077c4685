"""Batched Gauss-Newton / Levenberg bundle adjustment on TPU.

Replaces all g2o-based optimizers of the reference (SURVEY.md §2.4;
/root/reference/optimizing/src/Optimizer*.cpp) with ONE jitted solver over SoA
state tensors:

  * KF states are uniform 15-DOF blocks [theta(3), t(3), v(3), bg(3), ba(3)]
    with a per-DOF free mask (visual-only BA frees [0:6] only; fixed KFs free
    nothing) — one code path for every BA flavor.
  * residual types: reprojection (EdgeMono/EdgeSE3ProjectXYZ), 3-point
    colinearity (EdgeColine), 9-D IMU preintegration (EdgeInertial), bias
    random walks (EdgeGyroRW/EdgeAccRW), 15-D pose-IMU prior
    (EdgePriorPoseImu), bias priors (EdgePriorGyro/Acc). The reprojection
    family (the O(obs) hot path) uses an ANALYTIC batched linearization
    (_reproj_batch: elementwise multiply-reduce + shared-matrix matmuls;
    per-observation vmapped jacfwd lowers to ms-scale grouped-convolution
    fusions on TPU — asserted equal to jacfwd in tests); the small
    families (inertial links, priors, colines) keep vmapped jacfwd,
    consistent by construction with the residual definitions.
  * robust kernels are IRLS weights (estimator.robust).
  * landmarks are eliminated with a Schur complement over the block-diagonal
    part of Hll; the reduced (15N x 15N) system is solved with dense Cholesky
    on the MXU. Colines couple landmarks (the reference therefore solves the
    full sparse system with BlockSolverX, OptimizerLBA.cpp:103-105,
    setMarginalized(false) :165); we keep their exact gradient and
    block-diagonal Hessian part, then run Jacobi refinement sweeps on the
    landmark system including the coline cross-blocks — same stationary
    points, TPU-friendly dense algebra.

Everything is fixed-shape: problems are padded and masked, so XLA compiles a
few bucket sizes per BA flavor.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3
from ..geometry.cameras import CameraModel
from ..imu.preintegration import GRAVITY_VALUE
from .robust import kernel_code, kernel_rho, kernel_weight

# state block layout
DOF = 15
S_TH, S_T, S_V, S_BG, S_BA = 0, 3, 6, 9, 12

# chi2_hist capacity (fixed so the program shape is independent of
# opts.iters; runs longer than this overwrite the last slot — diagnostics
# only, iters_run/final_chi2 stay exact)
MAX_HIST = 32


class KFStates(NamedTuple):
    """SoA keyframe states: body-in-world pose + velocity + biases."""

    R: jax.Array   # (N, 3, 3) Rwb
    t: jax.Array   # (N, 3) twb
    v: jax.Array   # (N, 3)
    bg: jax.Array  # (N, 3)
    ba: jax.Array  # (N, 3)

    def retract(self, dx: jax.Array) -> "KFStates":
        """dx: (N, 15) local update, ImuCamPose::Update convention
        (G2oVertex.cpp: twb += Rwb*ut; Rwb = Rwb*exp(ur))."""
        dth, dt = dx[:, S_TH:S_T], dx[:, S_T:S_V]
        R = self.R @ so3.exp(dth)
        t = self.t + jnp.einsum("nij,nj->ni", self.R, dt)
        return KFStates(
            so3.normalize(R), t,
            self.v + dx[:, S_V:S_BG],
            self.bg + dx[:, S_BG:S_BA],
            self.ba + dx[:, S_BA:],
        )


class BAProblem(NamedTuple):
    """Padded residual data. All index arrays refer to KF slot / MP slot."""

    # reprojection observations
    r_kf: jax.Array     # (O,) int32
    r_mp: jax.Array     # (O,) int32
    r_uv: jax.Array     # (O, 2)
    r_valid: jax.Array  # (O,) bool

    # colines (3 landmark indices + weight)
    c_idx: jax.Array    # (C, 3) int32
    c_w: jax.Array      # (C,) aveWeight -> information = I * w
    c_valid: jax.Array  # (C,) bool

    # inertial links
    i_kf1: jax.Array    # (L,) int32
    i_kf2: jax.Array    # (L,)
    i_dR: jax.Array     # (L, 3, 3) preintegrated deltas at bias i_b0
    i_dV: jax.Array     # (L, 3)
    i_dP: jax.Array     # (L, 3)
    i_JRg: jax.Array    # (L, 3, 3) bias Jacobians
    i_JVg: jax.Array
    i_JVa: jax.Array
    i_JPg: jax.Array
    i_JPa: jax.Array
    i_b0: jax.Array     # (L, 6) [bg, ba] linearization bias
    i_sqi: jax.Array    # (L, 9, 9) sqrt information (upper Cholesky factor)
    i_dt: jax.Array     # (L,)
    i_valid: jax.Array  # (L,) bool
    i_huber: jax.Array  # (L,) bool — Huber(sqrt(16.92)) on this link

    # bias random walks (same links as inertial)
    rw_sqig: jax.Array  # (L, 3, 3) sqrt info gyro walk
    rw_sqia: jax.Array  # (L, 3, 3) sqrt info acc walk
    rw_valid: jax.Array # (L,)

    # 15-D pose-imu prior (EdgePriorPoseImu)
    p_kf: jax.Array     # (P,) int32
    p_R: jax.Array      # (P, 3, 3)
    p_t: jax.Array      # (P, 3)
    p_v: jax.Array      # (P, 3)
    p_bg: jax.Array     # (P, 3)
    p_ba: jax.Array     # (P, 3)
    p_sqi: jax.Array    # (P, 15, 15)
    p_valid: jax.Array  # (P,)

    # bias priors (EdgePriorGyro/Acc): r = bg/ba of kf, info = I * w
    bp_kf: jax.Array    # (B,) int32
    bp_wg: jax.Array    # (B,)
    bp_wa: jax.Array    # (B,)
    bp_valid: jax.Array # (B,)


def empty_problem(n_obs=0, n_col=0, n_links=0, n_priors=0, n_bp=0,
                  dtype=jnp.float32) -> BAProblem:
    """All-invalid padded problem (building block for host assemblers)."""
    f = lambda *s: jnp.zeros(s, dtype)
    i = lambda *s: jnp.zeros(s, jnp.int32)
    b = lambda *s: jnp.zeros(s, bool)
    eye9 = jnp.broadcast_to(jnp.eye(9, dtype=dtype), (n_links, 9, 9))
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n_links, 3, 3))
    eye15 = jnp.broadcast_to(jnp.eye(15, dtype=dtype), (n_priors, 15, 15))
    eyeL = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n_links, 3, 3))
    return BAProblem(
        r_kf=i(n_obs), r_mp=i(n_obs), r_uv=f(n_obs, 2), r_valid=b(n_obs),
        c_idx=i(n_col, 3), c_w=f(n_col), c_valid=b(n_col),
        i_kf1=i(n_links), i_kf2=i(n_links), i_dR=eye3, i_dV=f(n_links, 3),
        i_dP=f(n_links, 3), i_JRg=f(n_links, 3, 3), i_JVg=f(n_links, 3, 3),
        i_JVa=f(n_links, 3, 3), i_JPg=f(n_links, 3, 3), i_JPa=f(n_links, 3, 3),
        i_b0=f(n_links, 6), i_sqi=eye9, i_dt=f(n_links), i_valid=b(n_links),
        i_huber=b(n_links),
        rw_sqig=eyeL, rw_sqia=eyeL, rw_valid=b(n_links),
        p_kf=i(n_priors), p_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                               (n_priors, 3, 3)),
        p_t=f(n_priors, 3), p_v=f(n_priors, 3), p_bg=f(n_priors, 3),
        p_ba=f(n_priors, 3), p_sqi=eye15, p_valid=b(n_priors),
        bp_kf=i(n_bp), bp_wg=f(n_bp), bp_wa=f(n_bp), bp_valid=b(n_bp),
    )


@dataclasses.dataclass(frozen=True)
class BAOptions:
    """Solver configuration. A PYTREE, not a jit static arg: iters, lambda0,
    kernels (as int32 codes), deltas, chi2 threshold and tol are runtime
    leaves, so ALL BA flavors (LBA/LIBA/GBA/FIBA, any damping/robustifier)
    share ONE compiled solve program per shape bucket — each flavor
    otherwise costs a ~12 s XLA compile. `adapt` and `pcg_iters` stay
    static aux data (they change the program structure)."""

    iters: int = 10
    lambda0: float = 1e-5           # g2o userLambdaInit of the BA flavor
    adapt: bool = True              # reject worse steps, grow lambda
    reproj_kernel: str = "cauchy"   # LBA/GBA mapping default
    reproj_delta: float = 2.447574  # sqrt(5.991)
    coline_kernel: str = "huber"
    coline_delta: float = 2.795532  # sqrt(7.815)
    pcg_iters: int = 4              # landmark-system PCG (coline coupling)
    chi2_inlier_mono: float = 5.991
    # terminate when the accepted chi2 gain stays below tol (relative) for
    # two consecutive iterations — g2o's default terminate action (small
    # gain stops the LM loop); 0 disables and always runs `iters`.
    tol: float = 1e-3
    # Reduced-pose-system solver: 0 = dense Cholesky, >0 = block-Jacobi
    # PCG with that iteration cap (early exit at 1e-6 relative residual).
    # None = auto (PCG on accelerators, Cholesky on CPU): XLA's TPU
    # Cholesky+triangular-solve custom-call costs 3.2 ms/iter at the
    # 64-KF bucket (35% of the whole solve, profiled) and scales ~N^3,
    # while the damped SPD system solves in tens of cheap matvecs.
    pose_cg_iters: Optional[int] = None
    # Backtracking step accept (retry a rejected step at alpha = 1/4 and
    # 1/16 before growing lambda): None = auto (ON on accelerators — the
    # extra chi2 evaluations live in a lax.cond branch off the
    # accepted-step path and the persistent TPU compile cache amortizes
    # the larger program; OFF on the CPU test backend, where the branch
    # grew every solve-bucket's XLA:CPU compile enough to blow the CI
    # verification window). One default-lane test forces it ON so the
    # accelerator path has CPU coverage (same pattern as pose_cg_iters).
    backtrack: Optional[bool] = None


def _opt_leaf(x, np_type):
    """Option field -> strongly-typed scalar leaf (Python numbers would trace
    as weak — f64 under the tests' x64 mode — and fork programs). Non-numeric
    leaves (tracers, jax-internal ArgInfo placeholders in lower()/
    cost_analysis round-trips) pass through untouched."""
    if isinstance(x, (bool, int, float, np.floating, np.integer)):
        return np_type(x)
    return x


def _resolve_pose_cg(v):
    """None -> backend default (PCG on accelerators, Cholesky on CPU).
    Resolved at pytree-flatten time (host), so it is static aux data."""
    if v is None:
        return 64 if jax.default_backend() != "cpu" else 0
    return v


def _resolve_backtrack(v):
    """None -> backend default (see BAOptions.backtrack)."""
    if v is None:
        return jax.default_backend() != "cpu"
    return bool(v)


jax.tree_util.register_pytree_node(
    BAOptions,
    lambda o: ((_opt_leaf(o.iters, np.int32),
                _opt_leaf(o.lambda0, np.float32),
                _opt_leaf(kernel_code(o.reproj_kernel), np.int32),
                _opt_leaf(o.reproj_delta, np.float32),
                _opt_leaf(kernel_code(o.coline_kernel), np.int32),
                _opt_leaf(o.coline_delta, np.float32),
                _opt_leaf(o.chi2_inlier_mono, np.float32),
                _opt_leaf(o.tol, np.float32)),
               (o.adapt, o.pcg_iters, _resolve_pose_cg(o.pose_cg_iters),
                _resolve_backtrack(o.backtrack))),
    lambda aux, ls: BAOptions(
        iters=ls[0], lambda0=ls[1], reproj_kernel=ls[2], reproj_delta=ls[3],
        coline_kernel=ls[4], coline_delta=ls[5], chi2_inlier_mono=ls[6],
        tol=ls[7], adapt=aux[0], pcg_iters=aux[1], pose_cg_iters=aux[2],
        backtrack=aux[3]),
)


# ---------------------------------------------------------------------------
# residual functions (delta at zero -> jacfwd gives GN Jacobians)
# ---------------------------------------------------------------------------

def _perturb_pose(R, t, d6):
    Rn = R @ so3.exp(d6[:3])
    tn = t + R @ d6[3:6]
    return Rn, tn


def make_reproj_residual(cam: CameraModel, Rcb, tcb):
    """uv - project(Tcb * Twb(kf)^-1 * X) (EdgeMono, G2oEdge.cpp:14-20)."""

    def res(d_kf, d_mp, R, t, X, uv):
        Rn, tn = _perturb_pose(R, t, d_kf[:6])
        Xb = Rn.T @ (X + d_mp - tn)
        Xc = Rcb @ Xb + tcb
        return uv - cam.project(Xc)

    return res


def _outer_dd(Ja, Jb):
    """sum_d Ja[:, d, :, None] * Jb[:, d, None, :] — per-row residual-dim
    contraction as broadcast-multiply-reduce (a batched (i,d)@(d,j) dot
    lowers to grouped-convolution fusions on TPU, ms-scale at O~32k)."""
    return jnp.sum(Ja[:, :, :, None] * Jb[:, :, None, :], axis=1)


def _jtr_d(J, r):
    """sum_d J[:, d, :] * r[:, d, None] — J^T r per row, elementwise."""
    return jnp.sum(J * r[:, :, None], axis=1)


def _shared_right_mm(A, M):
    """Per-row (O,3,3) @ shared (3,3) as ONE large 2D matmul: per-row
    batched small matmuls lower to pathological grouped-convolution
    fusions on TPU (profiled: ms-scale inside the BA solve)."""
    o = A.shape[0]
    return jnp.matmul(A.reshape(o * 3, 3), M).reshape(o, 3, 3)


def _reproj_batch(cam: CameraModel, Rcb, tcb, Rg, tg, Xg, uv,
                  want_jac: bool):
    """Batched reprojection residual (+ analytic Jacobians) with NO
    per-observation batched matmuls — elementwise multiply-reduce and
    shared-matrix 2D matmuls only. Exactly the linearization jacfwd
    produced from `make_reproj_residual` at delta = 0 (asserted in
    tests/test_estimator.py), an order of magnitude cheaper on TPU.

    Returns (r (O,2), depth (O,), Jk (O,2,6), Jx (O,2,3)); the Jacobians
    are None when want_jac is False."""
    d = Xg - tg                                        # (O, 3)
    Xb = jnp.sum(Rg * d[:, :, None], axis=1)           # R^T d, elementwise
    Xc = Xb @ Rcb.T + tcb                              # shared 2D matmul
    r = uv - cam.project(Xc)
    depth = Xc[..., 2]
    if not want_jac:
        return r, depth, None, None
    Jp = cam.project_jac(Xc)                           # (O, 2, 3) elementwise
    # dXc/dX = Rcb R^T:   A[o] = Rcb @ Rg[o]^T  (shared-left matmul)
    A = _shared_right_mm(Rg, Rcb.T).transpose(0, 2, 1)
    # dXb/dtheta = [Xb]_x (right-mult convention: see make_reproj_residual)
    z = jnp.zeros_like(Xb[:, 0])
    Sk = jnp.stack([
        jnp.stack([z, -Xb[:, 2], Xb[:, 1]], -1),
        jnp.stack([Xb[:, 2], z, -Xb[:, 0]], -1),
        jnp.stack([-Xb[:, 1], Xb[:, 0], z], -1),
    ], -2)                                             # (O, 3, 3)
    B = _shared_right_mm(Sk.transpose(0, 2, 1), Rcb.T).transpose(0, 2, 1)
    # J* = -Jp @ {A, B} as elementwise multiply-reduce (2x3x3 per row)
    Jx = -jnp.sum(Jp[:, :, :, None] * A[:, None, :, :], axis=2)
    Jth = -jnp.sum(Jp[:, :, :, None] * B[:, None, :, :], axis=2)
    # dr/d(dt) = +Jp @ Rcb (shared 2D matmul)
    o = Jp.shape[0]
    Jdt = jnp.matmul(Jp.reshape(o * 2, 3), Rcb).reshape(o, 2, 3)
    Jk = jnp.concatenate([Jth, Jdt], axis=-1)          # (O, 2, 6)
    return r, depth, Jk, Jx


def coline_residual(d1, d2, d3, X1, X2, X3):
    """normalize(p2-p1) x normalize(p3-p2) (EdgeColine, G2oEdge.cpp:689-707).

    The norm is smoothed with a small epsilon so jacfwd stays finite for the
    degenerate padded entries (the reference zeroes the error there)."""
    v1 = (X2 + d2) - (X1 + d1)
    v2 = (X3 + d3) - (X2 + d2)
    n1 = v1 * jax.lax.rsqrt(jnp.sum(v1 * v1) + 1e-12)
    n2 = v2 * jax.lax.rsqrt(jnp.sum(v2 * v2) + 1e-12)
    return jnp.cross(n1, n2)


def inertial_residual(d1, d2, R1, t1, v1, bg1, ba1, R2, t2, v2,
                      dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, dt):
    """9-D preintegration residual (EdgeInertial::computeError,
    G2oEdge.cpp:241-262) with first-order bias correction."""
    R1n, t1n = _perturb_pose(R1, t1, d1[:6])
    v1n = v1 + d1[S_V:S_BG]
    bg = bg1 + d1[S_BG:S_BA]
    ba = ba1 + d1[S_BA:]
    R2n, t2n = _perturb_pose(R2, t2, d2[:6])
    v2n = v2 + d2[S_V:S_BG]

    dbg = bg - b0[:3]
    dba = ba - b0[3:]
    dR = dRm @ so3.exp(JRg @ dbg)
    dV = dVm + JVg @ dbg + JVa @ dba
    dP = dPm + JPg @ dbg + JPa @ dba

    g = jnp.array([0.0, 0.0, -GRAVITY_VALUE], R1.dtype)
    er = so3.log(dR.T @ R1n.T @ R2n)
    ev = R1n.T @ (v2n - v1n - g * dt) - dV
    ep = R1n.T @ (t2n - t1n - v1n * dt - 0.5 * g * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


def prior15_residual(d, R, t, v, bg, ba, R0, t0, v0, bg0, ba0):
    """EdgePriorPoseImu::computeError (G2oEdge.cpp)."""
    Rn, tn = _perturb_pose(R, t, d[:6])
    er = so3.log(R0.T @ Rn)
    et = R0.T @ (tn - t0)
    ev = (v + d[S_V:S_BG]) - v0
    ebg = (bg + d[S_BG:S_BA]) - bg0
    eba = (ba + d[S_BA:]) - ba0
    return jnp.concatenate([er, et, ev, ebg, eba])


# ---------------------------------------------------------------------------
# assembly helpers
# ---------------------------------------------------------------------------

def _whiten(J, r, sqi):
    """Apply sqrt information: J' = sqi @ J, r' = sqi @ r."""
    return sqi @ J, sqi @ r


# Gathers/scatters with data-dependent indices lower to ~40 ns/element
# scalar code on TPU; for the O(8k)-observation reprojection set that is
# milliseconds per linearization. On TPU both directions therefore run on
# the MXU as one-hot matmuls. HIGHEST precision (bf16x6 operand splitting)
# makes the select EXACT: a 0/1 one-hot row splits exactly into bf16 terms
# and the f32 operand's 3-way bf16 split re-sums without rounding, so
# `E @ table` reproduces table rows bit-for-bit.
#
# On CPU the trade inverts completely: scatters/gathers are cheap scalar
# loops while the dense (O x M) one-hot matmuls are tens of GFLOPs per
# linearization — so the CPU path (tests, virtual-mesh dryruns) keeps
# native gather/scatter. `E is None` selects the scatter path throughout.
_PREC_EXACT = jax.lax.Precision.HIGHEST


def _use_onehot() -> bool:
    # PPG_FORCE_ONEHOT=1 forces the accelerator (one-hot matmul) assembly
    # on CPU so tests can assert both paths build identical normal
    # equations; 0/unset keeps the backend-appropriate default.
    force = os.environ.get("PPG_FORCE_ONEHOT")
    if force is not None:
        return force == "1"
    return jax.default_backend() != "cpu"


def _onehot(idx, size, dtype):
    """(K,) int32 -> (K, size) 0/1 one-hot, or None on CPU backends."""
    if not _use_onehot():
        return None
    return (idx[:, None] == jnp.arange(size, dtype=jnp.int32)[None, :]
            ).astype(dtype)


def _sel(E, table, idx=None):
    """Row-gather table[idx]: E @ table on MXU (exact), table[idx] on CPU."""
    if E is None:
        return table[idx]
    flat = table.reshape(table.shape[0], -1)
    out = jnp.matmul(E, flat, precision=_PREC_EXACT)
    return out.reshape((E.shape[0],) + table.shape[1:])


def _accum_into(target, E, idx, vals):
    """target[s] += sum_{k: idx_k == s} vals[k] (leading-axis scatter-add):
    E^T @ vals on MXU, .at[idx].add on CPU."""
    if E is None:
        return target.at[idx].add(vals)
    flat = vals.reshape(vals.shape[0], -1)
    out = jnp.matmul(E.T, flat, precision=_PREC_EXACT)
    return target + out.reshape((E.shape[1],) + vals.shape[1:])


# ---------------------------------------------------------------------------
# slot-major observation layout (large-bucket scaling)
#
# The flat layout's landmark-side one-hot products are O(obs x M) matmuls and
# the dense W cross-block assembly is O(obs x M x N) — super-linear in window
# size (measured 1.7/5.9/15.8 device-ms/iter at 16/32/64 KFs in round 2).
# When the host assembler instead SORTS observations by landmark into K
# fixed slots per landmark (obs row o = mp*K + slot, r_mp[o] == o//K, padded
# slots invalid; overflowing observations in a small flat tail), every
# landmark-side product collapses:
#   * gathers of per-landmark tables become broadcasts (free),
#   * scatter-adds into landmark tables become axis-1 sums (free),
#   * W is assembled per landmark from its own K slots via a (M,K,N) one-hot
#     einsum — O(M x K x N) instead of O(obs x M x N).
# The normal equations are bit-identical in exact arithmetic; only the
# summation order changes. `slot_k` is a static solver arg (0 = flat).
# ---------------------------------------------------------------------------

def _mp_gather(table, r_mp, E_mp_tail, slot_k):
    """Per-observation rows of a per-landmark table: broadcast for the
    slot-major region, one-hot/native gather for the overflow tail."""
    m = table.shape[0]
    if slot_k == 0:
        return _sel(E_mp_tail, table, r_mp)
    mk = m * slot_k
    slot = jnp.broadcast_to(table[:, None], (m, slot_k) + table.shape[1:])
    slot = slot.reshape((mk,) + table.shape[1:])
    if r_mp.shape[0] == mk:
        return slot
    tail = _sel(E_mp_tail, table, r_mp[mk:])
    return jnp.concatenate([slot, tail], 0)


def _mp_accum(target, vals, r_mp, E_mp_tail, slot_k):
    """Per-landmark accumulation of per-observation values: axis-1 sum for
    the slot-major region, scatter/one-hot for the overflow tail."""
    m = target.shape[0]
    if slot_k == 0:
        return _accum_into(target, E_mp_tail, r_mp, vals)
    mk = m * slot_k
    out = target + vals[:mk].reshape((m, slot_k) + vals.shape[1:]).sum(1)
    if vals.shape[0] > mk:
        out = _accum_into(out, E_mp_tail, r_mp[mk:], vals[mk:])
    return out


def _inv3x3(A):
    """Closed-form batched 3x3 inverse via the adjugate — pure elementwise
    math that fuses; jnp.linalg.inv lowers to an LU custom-call + gather
    chain on TPU (profiled inside the BA solve loop). Callers pass
    regularized SPD blocks (det > 0)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c11 = e * i - f * h
    c12 = c * h - b * i
    c13 = b * f - c * e
    c21 = f * g - d * i
    c22 = a * i - c * g
    c23 = c * d - a * f
    c31 = d * h - e * g
    c32 = b * g - a * h
    c33 = a * e - b * d
    det = a * c11 + b * c21 + c * c31
    inv_det = 1.0 / det
    rows = jnp.stack([
        jnp.stack([c11, c12, c13], -1),
        jnp.stack([c21, c22, c23], -1),
        jnp.stack([c31, c32, c33], -1),
    ], -2)
    return rows * inv_det[..., None, None]


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------

def _compute_all(states: KFStates, points, prob: BAProblem, cam, Rcb, tcb,
                 opts: BAOptions, kf_dof, mp_free, axis=None, slot_k=0,
                 materialize_w=True):
    """One linearization: whitened residuals, Jacobians, robust weights.

    Returns (total_chi2, assembled Hpp (N15, N15), b_p (N15,), Hll (M,3,3),
    b_l (M,3), W (M, 3, N*6), coline terms for refinement).

    W spans only the 6 POSE columns of each keyframe state: reprojection is
    the only residual family coupling landmarks to keyframes, and its
    Jacobian w.r.t. velocity/bias is structurally zero — carrying the full
    15 columns made the W assembly (the dominant one-hot matmul,
    O(obs x M x N x cols)) 2.5x more expensive for exactly-zero work.
    solve_ba pads the visual Schur/rhs contributions back into the 15-DOF
    layout at static offsets.

    Under `shard_map` (axis = mesh axis name; states/points replicated,
    every BAProblem residual family sharded on its leading dim) each device
    linearizes its residual shard and the normal equations are psum-reduced
    over ICI — communication is O(states^2 + landmark cross blocks),
    independent of observation count (parallel/sharded_ba.py). The returned
    coline terms stay LOCAL (per-shard); the PCG matvec psums them."""
    n = states.R.shape[0]
    m = points.shape[0]
    n15 = n * DOF
    dtype = points.dtype

    Hpp = jnp.zeros((n, DOF, n, DOF), dtype)
    b_p = jnp.zeros((n, DOF), dtype)
    Hll = jnp.zeros((m, 3, 3), dtype)
    b_l = jnp.zeros((m, 3), dtype)
    # pose columns only (see docstring); never formed in implicit mode
    W = (jnp.zeros((m, 3, n * 6), dtype) if materialize_w else None)
    chi2_sum = jnp.zeros((), dtype)

    dof_mask = kf_dof.astype(dtype)  # (N, 15)
    mp_mask = mp_free.astype(dtype)  # (M,)

    # ---- reprojection ---------------------------------------------------
    mk = m * slot_k
    E_kf = _onehot(prob.r_kf, n, dtype)   # (O, N) or None on CPU
    # slot-major: landmark-side one-hot only for the (small) overflow tail
    E_mp = (_onehot(prob.r_mp, m, dtype) if slot_k == 0
            else (_onehot(prob.r_mp[mk:], m, dtype)
                  if prob.r_mp.shape[0] > mk else None))
    Rg = _sel(E_kf, states.R, prob.r_kf)
    tg = _sel(E_kf, states.t, prob.r_kf)
    Xg = _mp_gather(points, prob.r_mp, E_mp, slot_k)

    # analytic batched linearization (no per-obs vmapped jacfwd: its tiny
    # batched matmuls lower to ms-scale convolution fusions on TPU). Only
    # the 6 pose columns: reprojection does not depend on velocity/bias.
    r, _, Jk, Jx = _reproj_batch(cam, Rcb, tcb, Rg, tg, Xg, prob.r_uv,
                                 want_jac=True)        # Jk: (O, 2, 6)
    rv = prob.r_valid[:, None]
    r = jnp.where(rv, r, 0.0)
    Jk = jnp.where(rv[..., None], Jk, 0.0)
    Jx = jnp.where(rv[..., None], Jx, 0.0)
    chi2 = jnp.sum(r * r, axis=1)
    w = kernel_weight(opts.reproj_kernel, chi2, opts.reproj_delta)
    w = w * prob.r_valid
    chi2_sum += jnp.sum(
        jnp.where(prob.r_valid,
                  kernel_rho(opts.reproj_kernel, chi2, opts.reproj_delta),
                  0.0)
    )
    # apply free masks to Jacobian columns (mask gathers = exact matmuls)
    Jk = Jk * _sel(E_kf, dof_mask[:, :6], prob.r_kf)[:, None, :]
    Jx = Jx * _mp_gather(mp_mask[:, None], prob.r_mp, E_mp,
                         slot_k)[:, None, :]
    sw = w[:, None, None]
    pad9 = ((0, 0), (0, DOF - 6), (0, DOF - 6))

    # assembly: E^T-matmuls on MXU; scatter-adds on CPU
    blocks_kk = sw * _outer_dd(Jk, Jk)                     # (O, 6, 6)
    if E_kf is None:
        Hpp = Hpp.at[prob.r_kf, :, prob.r_kf, :].add(
            jnp.pad(blocks_kk, pad9))
    else:
        Hpp = Hpp.at[jnp.arange(n), :, jnp.arange(n), :].add(jnp.pad(
            _accum_into(jnp.zeros((n, 6, 6), dtype), E_kf, prob.r_kf,
                        blocks_kk), pad9))
    bacc = _accum_into(jnp.zeros((n, 6), dtype), E_kf, prob.r_kf,
                       w[:, None] * _jtr_d(Jk, r))
    b_p = b_p + jnp.pad(bacc, ((0, 0), (0, DOF - 6)))
    Hll = _mp_accum(Hll, sw * _outer_dd(Jx, Jx),
                    prob.r_mp, E_mp, slot_k)
    b_l = _mp_accum(b_l, w[:, None] * _jtr_d(Jx, r),
                    prob.r_mp, E_mp, slot_k)
    # W[m, i, n*6+k]: per-obs (3,6) block into its KF pose-column band
    Bw = sw * _outer_dd(Jx, Jk)                            # (O, 3, 6)
    if not materialize_w:
        # implicit-Schur mode (large buckets): the dense W (M, 3, N*6) and
        # its O(M * (N*6)^2) fold are never formed — solve_ba's implicit
        # CG consumes the raw per-obs blocks directly (O(obs) matvecs via
        # the landmark-major slot layout and a kf-major permutation).
        # Bw already carries the robust weight and the free-DOF masks.
        W = Bw
    elif slot_k:
        # each landmark's K slots scatter only into that landmark's row of
        # W: an O(M x K x N) slot-sum replaces the flat path's
        # O(obs x M x N) assembly (the round-2 scaling bottleneck)
        Bs = Bw[:mk].reshape(m, slot_k, 3, 6)
        if E_kf is None:
            kf_slots = prob.r_kf[:mk].reshape(m, slot_k)
            G = jnp.zeros((m, n, 3, 6), dtype).at[
                jnp.arange(m)[:, None], kf_slots].add(Bs)
            W = W + G.transpose(0, 2, 1, 3).reshape(m, 3, n * 6)
        else:
            # broadcast-multiply + K-reduction, NOT a one-hot einsum: the
            # HIGHEST-precision einsum form lowered to three convolution
            # passes costing 1.4 ms/iter at the 64-KF bucket (profiled);
            # the select-and-reduce is exact by construction and
            # bandwidth-bound only
            E_slot = E_kf[:mk].reshape(m, slot_k, n)
            Gt = (E_slot[:, :, None, :, None]
                  * Bs[:, :, :, None, :]).sum(1)      # (M, 3, N, 6)
            W = W + Gt.reshape(m, 3, n * 6)
    if materialize_w and (slot_k == 0 or Bw.shape[0] > mk):
        Bw_t = Bw if slot_k == 0 else Bw[mk:]
        r_kf_t = prob.r_kf if slot_k == 0 else prob.r_kf[mk:]
        r_mp_t = prob.r_mp if slot_k == 0 else prob.r_mp[mk:]
        E_kf_t = E_kf if (E_kf is None or slot_k == 0) else E_kf[mk:]
        if E_kf_t is None:
            cols = ((r_kf_t * 6)[:, None, None]
                    + jnp.arange(6)[None, None, :])
            W = W.at[r_mp_t[:, None, None],
                     jnp.arange(3)[None, :, None], cols].add(Bw_t)
        else:
            C1 = (E_kf_t[:, None, :, None] * Bw_t[:, :, None, :]).reshape(
                E_kf_t.shape[0], 3, n * 6)                 # (O, 3, N6)
            W = _accum_into(W, E_mp, r_mp_t, C1)

    # ---- colines --------------------------------------------------------
    Ec = [_onehot(prob.c_idx[:, a], m, dtype) for a in range(3)]
    Xc1, Xc2, Xc3 = (_sel(Ec[0], points, prob.c_idx[:, 0]),
                     _sel(Ec[1], points, prob.c_idx[:, 1]),
                     _sel(Ec[2], points, prob.c_idx[:, 2]))

    def coline_one(X1, X2, X3):
        z3 = jnp.zeros(3, dtype)
        rc = coline_residual(z3, z3, z3, X1, X2, X3)
        J1, J2, J3 = jax.jacfwd(coline_residual, argnums=(0, 1, 2))(
            z3, z3, z3, X1, X2, X3)
        return rc, J1, J2, J3

    rc, J1, J2, J3 = jax.vmap(coline_one)(Xc1, Xc2, Xc3)
    chi2c = jnp.sum(rc * rc, axis=1) * prob.c_w
    wc = kernel_weight(opts.coline_kernel, chi2c, opts.coline_delta)
    wc = wc * prob.c_valid * prob.c_w  # includes information weight
    chi2_sum += jnp.sum(
        jnp.where(prob.c_valid,
                  kernel_rho(opts.coline_kernel, chi2c, opts.coline_delta),
                  0.0)
    )
    # sanitize padded entries (where on validity, NOT weight-multiply: 0*nan=nan)
    cv = prob.c_valid[:, None, None]
    rc = jnp.where(prob.c_valid[:, None], rc, 0.0)
    J1 = jnp.where(cv, J1, 0.0)
    J2 = jnp.where(cv, J2, 0.0)
    J3 = jnp.where(cv, J3, 0.0)
    Js = [J1 * _sel(Ec[0], mp_mask[:, None], prob.c_idx[:, 0])[:, None, :],
          J2 * _sel(Ec[1], mp_mask[:, None], prob.c_idx[:, 1])[:, None, :],
          J3 * _sel(Ec[2], mp_mask[:, None], prob.c_idx[:, 2])[:, None, :]]
    swc = wc[:, None, None]
    # Coline contributions go into a SEPARATE landmark block, NOT Hll: the
    # pose-system Schur fold W^T Hll^-1 W is exact only for the
    # reprojection-only coupling (colines have no pose Jacobian). Folding
    # with a coline-inflated Hll under-corrects the visual cancellation and
    # leaves a fraction of the enormous camera-only stiffness as SPURIOUS
    # curvature along vision-invariant modes — measured 9.5e6 vs a true 450
    # along the global-scale mode of a mis-scaled inertial map, freezing
    # FIBA's metric-scale recovery entirely (r4 root cause). NOTE: the
    # solver still folds with Hll_r = Hll + Hll_col (solve_ba builds the
    # coupled landmark operator once and uses it consistently in fold,
    # back-substitution, and preconditioner — mixed models measured
    # non-descent); the Hll/Hll_col split here exists for diagnostics and
    # test introspection. The scale-mode cure is the conformal line search
    # in ba.py, not this split.
    Hll_col = jnp.zeros((m, 3, 3), dtype)
    for a in range(3):
        Hll_col = _accum_into(Hll_col, Ec[a], prob.c_idx[:, a],
                              swc * jnp.einsum("odi,odj->oij", Js[a], Js[a]))
        b_l = _accum_into(b_l, Ec[a], prob.c_idx[:, a],
                          wc[:, None] * jnp.einsum("odi,od->oi", Js[a], rc))
    # cross-blocks are handled in the Jacobi refinement (kept out of Schur)
    coline_terms = (rc, Js, wc, Ec)

    # ---- inertial links ---------------------------------------------------
    def inertial_one(k1, k2, dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, sqi,
                     dt_):
        z = jnp.zeros(DOF, dtype)
        args = (states.R[k1], states.t[k1], states.v[k1], states.bg[k1],
                states.ba[k1], states.R[k2], states.t[k2], states.v[k2],
                dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, dt_)
        ri = inertial_residual(z, z, *args)
        Ja, Jb = jax.jacfwd(inertial_residual, argnums=(0, 1))(z, z, *args)
        Ja, ri_w = _whiten(Ja, ri, sqi)
        Jb = sqi @ Jb
        return ri_w, Ja, Jb

    ri, Ja, Jb = jax.vmap(inertial_one)(
        prob.i_kf1, prob.i_kf2, prob.i_dR, prob.i_dV, prob.i_dP, prob.i_JRg,
        prob.i_JVg, prob.i_JVa, prob.i_JPg, prob.i_JPa, prob.i_b0, prob.i_sqi,
        prob.i_dt)
    chi2i = jnp.sum(ri * ri, axis=1)
    wi = jnp.where(prob.i_huber,
                   kernel_weight(1, chi2i, 4.113393), 1.0)  # huber sqrt(16.92)
    wi = wi * prob.i_valid
    chi2_sum += jnp.sum(jnp.where(
        prob.i_valid,
        jnp.where(prob.i_huber, kernel_rho(1, chi2i, 4.113393), chi2i), 0.0))
    Ja = Ja * dof_mask[prob.i_kf1][:, None, :]
    Jb = Jb * dof_mask[prob.i_kf2][:, None, :]
    swi = wi[:, None, None]
    Hpp = Hpp.at[prob.i_kf1, :, prob.i_kf1, :].add(
        swi * jnp.einsum("odi,odj->oij", Ja, Ja))
    Hpp = Hpp.at[prob.i_kf2, :, prob.i_kf2, :].add(
        swi * jnp.einsum("odi,odj->oij", Jb, Jb))
    Hpp = Hpp.at[prob.i_kf1, :, prob.i_kf2, :].add(
        swi * jnp.einsum("odi,odj->oij", Ja, Jb))
    Hpp = Hpp.at[prob.i_kf2, :, prob.i_kf1, :].add(
        swi * jnp.einsum("odi,odj->oij", Jb, Ja))
    b_p = b_p.at[prob.i_kf1].add(wi[:, None] * jnp.einsum("odi,od->oi", Ja, ri))
    b_p = b_p.at[prob.i_kf2].add(wi[:, None] * jnp.einsum("odi,od->oi", Jb, ri))

    # ---- bias random walks (r = b2 - b1, J = [-I, +I], whitened) ----------
    for slot, sq, getter in (
        (S_BG, prob.rw_sqig, lambda s, k: s.bg[k]),
        (S_BA, prob.rw_sqia, lambda s, k: s.ba[k]),
    ):
        rrw = jnp.einsum("lij,lj->li",
                         sq, getter(states, prob.i_kf2) - getter(states, prob.i_kf1))
        wrw = prob.rw_valid.astype(dtype)
        chi2_sum += jnp.sum(jnp.where(prob.rw_valid,
                                      jnp.sum(rrw * rrw, axis=1), 0.0))
        m1 = dof_mask[prob.i_kf1][:, slot:slot + 3]
        m2 = dof_mask[prob.i_kf2][:, slot:slot + 3]
        Jw1 = -sq * m1[:, None, :]
        Jw2 = sq * m2[:, None, :]
        sw = wrw[:, None, None]
        blk11 = sw * jnp.einsum("odi,odj->oij", Jw1, Jw1)
        blk22 = sw * jnp.einsum("odi,odj->oij", Jw2, Jw2)
        blk12 = sw * jnp.einsum("odi,odj->oij", Jw1, Jw2)
        sl = slice(slot, slot + 3)
        Hpp = Hpp.at[prob.i_kf1, sl, prob.i_kf1, sl].add(blk11)
        Hpp = Hpp.at[prob.i_kf2, sl, prob.i_kf2, sl].add(blk22)
        Hpp = Hpp.at[prob.i_kf1, sl, prob.i_kf2, sl].add(blk12)
        Hpp = Hpp.at[prob.i_kf2, sl, prob.i_kf1, sl].add(
            blk12.transpose(0, 2, 1))
        b_p = b_p.at[prob.i_kf1, sl].add(
            wrw[:, None] * jnp.einsum("odi,od->oi", Jw1, rrw))
        b_p = b_p.at[prob.i_kf2, sl].add(
            wrw[:, None] * jnp.einsum("odi,od->oi", Jw2, rrw))

    # ---- 15-D priors -------------------------------------------------------
    def prior_one(kf, R0, t0, v0, bg0, ba0, sqi):
        z = jnp.zeros(DOF, dtype)
        args = (states.R[kf], states.t[kf], states.v[kf], states.bg[kf],
                states.ba[kf], R0, t0, v0, bg0, ba0)
        rp = prior15_residual(z, *args)
        Jp = jax.jacfwd(prior15_residual, argnums=0)(z, *args)
        return sqi @ rp, sqi @ Jp

    rp, Jp = jax.vmap(prior_one)(prob.p_kf, prob.p_R, prob.p_t, prob.p_v,
                                 prob.p_bg, prob.p_ba, prob.p_sqi)
    wp = prob.p_valid.astype(dtype)
    chi2_sum += jnp.sum(jnp.where(prob.p_valid, jnp.sum(rp * rp, axis=1), 0.0))
    Jp = Jp * dof_mask[prob.p_kf][:, None, :]
    Hpp = Hpp.at[prob.p_kf, :, prob.p_kf, :].add(
        wp[:, None, None] * jnp.einsum("odi,odj->oij", Jp, Jp))
    b_p = b_p.at[prob.p_kf].add(wp[:, None] * jnp.einsum("odi,od->oi", Jp, rp))

    # ---- bias priors (diagonal, trivial) -----------------------------------
    wbg = prob.bp_wg * prob.bp_valid
    wba = prob.bp_wa * prob.bp_valid
    bg_v = states.bg[prob.bp_kf]
    ba_v = states.ba[prob.bp_kf]
    chi2_sum += jnp.sum(wbg * jnp.sum(bg_v * bg_v, 1)
                        + wba * jnp.sum(ba_v * ba_v, 1))
    mgg = kf_dof[prob.bp_kf, S_BG:S_BA].astype(dtype)
    mba = kf_dof[prob.bp_kf, S_BA:].astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    Hpp = Hpp.at[prob.bp_kf, S_BG:S_BA, prob.bp_kf, S_BG:S_BA].add(
        wbg[:, None, None] * eye3 * mgg[:, :, None] * mgg[:, None, :])
    Hpp = Hpp.at[prob.bp_kf, S_BA:, prob.bp_kf, S_BA:].add(
        wba[:, None, None] * eye3 * mba[:, :, None] * mba[:, None, :])
    b_p = b_p.at[prob.bp_kf, S_BG:S_BA].add(wbg[:, None] * bg_v * mgg)
    b_p = b_p.at[prob.bp_kf, S_BA:].add(wba[:, None] * ba_v * mba)

    Hpp = Hpp.reshape(n15, n15)
    b_p = b_p.reshape(n15)
    if axis is not None:
        if materialize_w:
            chi2_sum, Hpp, b_p, Hll, Hll_col, b_l, W = jax.lax.psum(
                (chi2_sum, Hpp, b_p, Hll, Hll_col, b_l, W), axis)
        else:
            # implicit mode keeps the per-obs blocks LOCAL to the shard —
            # the matvecs psum their (M,3)/(N,6) results instead, shrinking
            # the per-iteration collective from O(M*N) to O(M + N)
            chi2_sum, Hpp, b_p, Hll, Hll_col, b_l = jax.lax.psum(
                (chi2_sum, Hpp, b_p, Hll, Hll_col, b_l), axis)
    return chi2_sum, Hpp, b_p, Hll, Hll_col, b_l, W, coline_terms


def _chi2_only(states, points, prob, cam, Rcb, tcb, opts, axis=None,
               slot_k=0):
    """Total robust cost at a state (for LM step accept/reject)."""
    dtype = points.dtype
    n = states.R.shape[0]
    m = points.shape[0]
    mk = m * slot_k
    E_kf = _onehot(prob.r_kf, n, dtype)
    E_mp = (_onehot(prob.r_mp, m, dtype) if slot_k == 0
            else (_onehot(prob.r_mp[mk:], m, dtype)
                  if prob.r_mp.shape[0] > mk else None))
    Rg = _sel(E_kf, states.R, prob.r_kf)
    tg = _sel(E_kf, states.t, prob.r_kf)
    Xg = _mp_gather(points, prob.r_mp, E_mp, slot_k)

    r, _, _, _ = _reproj_batch(cam, Rcb, tcb, Rg, tg, Xg, prob.r_uv,
                               want_jac=False)
    chi2 = jnp.sum(r * r, axis=1)
    total = jnp.sum(jnp.where(prob.r_valid,
                              kernel_rho(opts.reproj_kernel, chi2,
                                         opts.reproj_delta), 0.0))

    def coline_one(X1, X2, X3):
        z3 = jnp.zeros(3, dtype)
        return coline_residual(z3, z3, z3, X1, X2, X3)

    rc = jax.vmap(coline_one)(
        _sel(_onehot(prob.c_idx[:, 0], m, dtype), points, prob.c_idx[:, 0]),
        _sel(_onehot(prob.c_idx[:, 1], m, dtype), points, prob.c_idx[:, 1]),
        _sel(_onehot(prob.c_idx[:, 2], m, dtype), points, prob.c_idx[:, 2]))
    chi2c = jnp.sum(rc * rc, axis=1) * prob.c_w
    total += jnp.sum(jnp.where(prob.c_valid,
                               kernel_rho(opts.coline_kernel, chi2c,
                                          opts.coline_delta), 0.0))

    def inertial_one(k1, k2, dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, sqi,
                     dt_):
        z = jnp.zeros(DOF, dtype)
        ri = inertial_residual(
            z, z, states.R[k1], states.t[k1], states.v[k1], states.bg[k1],
            states.ba[k1], states.R[k2], states.t[k2], states.v[k2],
            dRm, dVm, dPm, JRg, JVg, JVa, JPg, JPa, b0, dt_)
        return sqi @ ri

    ri = jax.vmap(inertial_one)(
        prob.i_kf1, prob.i_kf2, prob.i_dR, prob.i_dV, prob.i_dP, prob.i_JRg,
        prob.i_JVg, prob.i_JVa, prob.i_JPg, prob.i_JPa, prob.i_b0, prob.i_sqi,
        prob.i_dt)
    chi2i = jnp.sum(ri * ri, axis=1)
    total += jnp.sum(jnp.where(
        prob.i_valid,
        jnp.where(prob.i_huber, kernel_rho(1, chi2i, 4.113393), chi2i), 0.0))

    for sq, get in ((prob.rw_sqig, lambda k: states.bg[k]),
                    (prob.rw_sqia, lambda k: states.ba[k])):
        rrw = jnp.einsum("lij,lj->li", sq, get(prob.i_kf2) - get(prob.i_kf1))
        total += jnp.sum(jnp.where(prob.rw_valid, jnp.sum(rrw * rrw, 1), 0.0))

    def prior_one(kf, R0, t0, v0, bg0, ba0, sqi):
        z = jnp.zeros(DOF, dtype)
        rp = prior15_residual(z, states.R[kf], states.t[kf], states.v[kf],
                              states.bg[kf], states.ba[kf], R0, t0, v0, bg0,
                              ba0)
        return sqi @ rp

    rp = jax.vmap(prior_one)(prob.p_kf, prob.p_R, prob.p_t, prob.p_v,
                             prob.p_bg, prob.p_ba, prob.p_sqi)
    total += jnp.sum(jnp.where(prob.p_valid, jnp.sum(rp * rp, 1), 0.0))

    wbg = prob.bp_wg * prob.bp_valid
    wba = prob.bp_wa * prob.bp_valid
    total += jnp.sum(wbg * jnp.sum(states.bg[prob.bp_kf] ** 2, 1)
                     + wba * jnp.sum(states.ba[prob.bp_kf] ** 2, 1))
    if axis is not None:
        total = jax.lax.psum(total, axis)
    return total


@functools.partial(jax.jit, static_argnames=("axis", "slot_k"))
def solve_ba(states: KFStates, points: jax.Array, prob: BAProblem,
             kf_dof: jax.Array, mp_free: jax.Array, Rcb: jax.Array,
             tcb: jax.Array, cam: CameraModel, opts: BAOptions,
             axis: Optional[str] = None, slot_k: int = 0, kfm=None):
    """Run `opts.iters` damped-GN iterations. Returns (states, points, info).

    info carries per-iteration chi2 for diagnostics, the final damping
    (``lam``: chunked callers resume by passing it back as ``opts.lambda0``
    — see ba._padded_solve / the reference's force-stop flag checked inside
    g2o, OptimizerLBA.cpp:112-113), and the final per-obs chi2 /
    depth-positivity for the callers' outlier classification.

    `cam` and `opts` are pytrees of runtime leaves (see BAOptions /
    CameraModel registration): every BA flavor, damping schedule, robust
    kernel choice and camera calibration shares one compiled program per
    (shape bucket, opts.adapt, opts.pcg_iters, cam.kind).

    kfm: optional (perm, mask) kf-major observation layout (ba._kfm_layout)
    switching the reduced-pose solve to the IMPLICIT Schur path: the dense
    W (M, 3, N*6) and its O(M * (N*6)^2) fold are never formed; the CG
    matvec applies W / W^T observation-wise in O(obs) via the landmark-
    major slot layout and this kf-major permutation. Exact same reduced
    system S (to float round-off), sub-quadratic in KF count — the r4
    solver table measured the dense fold at 3.1/10.1/19.7 device-ms/iter
    for 64/128/200 KFs (O(M N^2)). Requires slot_k > 0 and pose_cg_iters
    > 0 (no Cholesky on an implicit operator).
    """
    n = states.R.shape[0]
    m = points.shape[0]
    n15 = n * DOF
    dtype = points.dtype
    implicit = kfm is not None
    if implicit:
        assert slot_k > 0, "implicit Schur path requires the slot layout"

    dof_flat = kf_dof.reshape(-1)

    def solve_iter(carry, _):
        states_c, points_c, lam, last_chi2 = carry
        chi2, Hpp, b_p, Hll, Hll_col, b_l, W, coline_terms = _compute_all(
            states_c, points_c, prob, cam, Rcb, tcb, opts, kf_dof, mp_free,
            axis=axis, slot_k=slot_k, materialize_w=not implicit)

        # Landmark-block solve operator: fixed-k damped-Jacobi polynomial
        # approximation of (Hll_r + C_full)^-1 — the coline-COUPLED
        # landmark block including cross-blocks — applied IDENTICALLY in
        # the Schur fold and the back-substitution. Derivation from the r4
        # root-cause hunt, every simpler split measured broken:
        #   * diagonal-only coline curvature in the fold under-corrects
        #     the visual cancellation and injects spurious stiffness along
        #     vision-invariant modes (9.5e6 vs a true 450 along the
        #     global-scale mode — froze FIBA's metric-scale recovery);
        #   * no coline curvature at all lets the coline gradient push
        #     points along the weak visual-depth direction unchecked
        #     (~50x overshoot on the coline unit fixture);
        #   * mixed models (fold one way, back-substitute another) are not
        #     even descent directions (10 straight rejections at
        #     alpha=1/16).
        # Landmark block: the coline-aware diagonal (visual + damping +
        # coline diagonal) for the Schur fold, with the coline CROSS blocks
        # handled by the back-substitution PCG — the structure with the
        # best measured general convergence (it solves the noisy VI bucket
        # 371 -> 37 chi2 in one step where every "consistent-model"
        # variant tried in r4 rejected its first steps; see the r4 notes in
        # full_inertial_ba for the one mode this fold gets WRONG and how
        # the conformal line search compensates).
        eye3 = jnp.eye(3, dtype=dtype)
        Hll_r = Hll + Hll_col + (lam + 1e-8) * eye3[None]
        Hll_inv = _inv3x3(Hll_r)

        # Schur: S = Hpp - W^T Hll^-1 W; rhs = b_p - W^T Hll^-1 b_l.
        # W spans only the 6 pose columns per KF (reprojection is the only
        # landmark-coupled family) — compute the visual correction in the
        # compact (N6) layout and pad it into the 15-DOF blocks at static
        # offsets. NOTE: because Hll here carries the coline DIAGONAL
        # without its cross blocks, this fold under-corrects the visual
        # cancellation along vision-invariant (conformal) modes and makes
        # the reduced system look ~1e4x stiffer there than it is
        # (measured); whole-map inertial solves that must anneal the
        # monocular scale run a conformal line search around this solver
        # (estimator.ba.full_inertial_ba) to compensate.
        mask_f = (dof_flat > 0).astype(dtype)
        if implicit:
            # IMPLICIT Schur path (large buckets): never materialize W or
            # S. W x and W^T t are applied observation-wise — the landmark
            # side rides the slot-major layout ((M, K) gather + K-sum),
            # the keyframe side the kf-major permutation ((N, S) gather +
            # S-sum) — so each CG matvec costs O(obs), not O(M * (N6)^2).
            # The operator equals the dense S exactly (same blocks, same
            # damping/masking), only the evaluation order differs.
            Bw = W  # (O, 3, 6) raw per-obs blocks from _compute_all
            perm, pmask = kfm
            mk = m * slot_k
            kf_slots = prob.r_kf[:mk].reshape(m, slot_k)
            Bs = Bw[:mk].reshape(m, slot_k, 3, 6)
            has_tail = Bw.shape[0] > mk
            E_mp_t = (_onehot(prob.r_mp[mk:], m, dtype) if has_tail
                      else None)
            Bw_kf = Bw[perm] * pmask[:, None, None]      # (N*S, 3, 6)
            rmp_kf = prob.r_mp[perm]
            s_slots = perm.shape[0] // n

            def _w_x(x6):
                # (N, 6) -> (M, 3): slot-major gather + K-reduction
                out = jnp.einsum("mkij,mkj->mi", Bs, x6[kf_slots])
                if has_tail:
                    vt = jnp.einsum("oij,oj->oi", Bw[mk:],
                                    x6[prob.r_kf[mk:]])
                    out = _accum_into(out, E_mp_t, prob.r_mp[mk:], vt)
                if axis is not None:
                    out = jax.lax.psum(out, axis)
                return out

            def _wt_t(t):
                # (M, 3) -> (N, 6): kf-major gather + S-reduction
                v = jnp.einsum("pij,pi->pj", Bw_kf, t[rmp_kf])
                out = v.reshape(n, s_slots, 6).sum(1)
                if axis is not None:
                    out = jax.lax.psum(out, axis)
                return out

            r6 = _wt_t(jnp.einsum("mij,mj->mi", Hll_inv, b_l))
            rhs = b_p - jnp.pad(r6, ((0, 0), (0, DOF - 6))).reshape(n15)

            def S_mv(x):
                xm = x * mask_f
                y = Hpp @ xm + lam * xm
                t = jnp.einsum("mij,mj->mi", Hll_inv,
                               _w_x(xm.reshape(n, DOF)[:, :6]))
                y = y - jnp.pad(_wt_t(t),
                                ((0, 0), (0, DOF - 6))).reshape(n15)
                return y * mask_f + (1.0 - mask_f) * x

            # diag(S) for the Jacobi preconditioner, observation-wise:
            # each (m, kf) pair holds at most one obs, so the fold's
            # diagonal is a plain scatter of diag(Bw^T Hll_inv Bw)
            dg = jnp.einsum("pai,pab,pbi->pi", Bw_kf, Hll_inv[rmp_kf],
                            Bw_kf)
            dfold = dg.reshape(n, s_slots, 6).sum(1)
            if axis is not None:
                dfold = jax.lax.psum(dfold, axis)
            dS = (jnp.diagonal(Hpp) + lam
                  - jnp.pad(dfold, ((0, 0), (0, DOF - 6))).reshape(n15))
            d_inv = 1.0 / jnp.maximum(jnp.where(dof_flat > 0, dS, 1.0),
                                      1e-12)
        else:
            HinvW = jnp.einsum("mij,mjp->mip", Hll_inv, W)   # (M, 3, N6)
            S6 = jnp.einsum("mip,miq->pq", W, HinvW).reshape(n, 6, n, 6)
            S = Hpp - jnp.pad(
                S6, ((0, 0), (0, DOF - 6), (0, 0), (0, DOF - 6))).reshape(
                n15, n15)
            r6 = jnp.einsum("mip,mi->p", W,
                            jnp.einsum("mij,mj->mi", Hll_inv, b_l))
            rhs = b_p - jnp.pad(r6.reshape(n, 6),
                                ((0, 0), (0, DOF - 6))).reshape(n15)

            # damping + fixed-DOF handling
            S = S + lam * jnp.eye(n15, dtype=dtype)
            S = jnp.where(dof_flat[:, None] * dof_flat[None, :] > 0, S, 0.0)
            S = S + jnp.diag(jnp.where(dof_flat > 0, 0.0, 1.0))

            def S_mv(x):
                return S @ x

            if opts.pose_cg_iters and opts.pose_cg_iters > 0:
                d_inv = 1.0 / jnp.maximum(jnp.diag(S), 1e-12)

        if implicit or (opts.pose_cg_iters and opts.pose_cg_iters > 0):
            # Block-Jacobi PCG on the damped SPD reduced system: XLA's
            # dense Cholesky + two triangular solves are a sequential
            # custom-call (~3.2 ms/iter at 64 KFs, ~N^3) while tens of
            # matvecs are bandwidth-trivial. Early exit at 1e-6
            # relative residual; the LM accept/reject loop absorbs any
            # residual inexactness.
            def prec(x):
                return x * d_inv

            x0 = jnp.zeros(n15, dtype)
            r0 = rhs
            z0 = prec(r0)
            rz0 = jnp.dot(r0, z0)
            rr_ref = jnp.dot(r0, r0)

            def cg_cond(c):
                it, _, r_, _, _, _ = c
                return (it < opts.pose_cg_iters) & (
                    jnp.dot(r_, r_) > 1e-12 * rr_ref)

            def cg_body(c):
                it, x, r_, z_, p_, rz = c
                Sp = S_mv(p_)
                alpha = rz / jnp.maximum(jnp.dot(p_, Sp), 1e-30)
                x = x + alpha * p_
                r_n = r_ - alpha * Sp
                z_n = prec(r_n)
                rz_n = jnp.dot(r_n, z_n)
                beta = rz_n / jnp.maximum(rz, 1e-30)
                return (it + 1, x, r_n, z_n, z_n + beta * p_, rz_n)

            _, sol, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body,
                (jnp.asarray(0, jnp.int32), x0, r0, z0, z0, rz0))
            dx_p = -sol
        else:
            L = jnp.linalg.cholesky(S)
            dx_p = -jax.scipy.linalg.cho_solve((L, True), rhs)
        dx_p = jnp.where(dof_flat > 0, dx_p, 0.0)

        # back-substitute landmarks: A dx_l = -(b_l + W dx_p), where
        # A = blockdiag(Hll_r) + coline cross-blocks (SPD). Solved with PCG
        # preconditioned by the block-diagonal inverse — exact coline coupling
        # without a sparse factorization (the reference solves the full sparse
        # system instead; see module docstring).
        dx_p6 = dx_p.reshape(n, DOF)[:, :6].reshape(n * 6)
        if implicit:
            rhs_l = -(b_l + _w_x(dx_p6.reshape(n, 6)))
        else:
            rhs_l = -(b_l + jnp.einsum("mip,p->mi", W, dx_p6))
        rc, Js, wc, Ec = coline_terms

        c_idx = prob.c_idx

        def A_mv(x):
            # replicated block-diagonal part + (possibly mesh-sharded)
            # coline cross-block part: Hll_r was already psum'd, the coline
            # terms are per-shard — reduce their matvec contribution only
            yc = jnp.zeros_like(x)
            xg = [_sel(Ec[b], x, c_idx[:, b]) for b in range(3)]
            for a in range(3):
                acc = jnp.zeros((c_idx.shape[0], 3), dtype)
                for bidx in range(3):
                    if bidx == a:
                        continue
                    Hab = wc[:, None, None] * jnp.einsum(
                        "odi,odj->oij", Js[a], Js[bidx])
                    acc += jnp.einsum("oij,oj->oi", Hab, xg[bidx])
                yc = _accum_into(yc, Ec[a], c_idx[:, a], acc)
            if axis is not None:
                yc = jax.lax.psum(yc, axis)
            return jnp.einsum("mij,mj->mi", Hll_r, x) + yc

        Minv = lambda x: jnp.einsum("mij,mj->mi", Hll_inv, x)
        dx_l = Minv(rhs_l)
        if opts.pcg_iters > 0:
            r_cg = rhs_l - A_mv(dx_l)
            z_cg = Minv(r_cg)

            def pcg_step(carry, _):
                x, r_, z_, p_ = carry
                Ap = A_mv(p_)
                rz = jnp.sum(r_ * z_)
                alpha = rz / jnp.maximum(jnp.sum(p_ * Ap), 1e-20)
                x = x + alpha * p_
                r_n = r_ - alpha * Ap
                z_n = Minv(r_n)
                beta = jnp.sum(r_n * z_n) / jnp.maximum(rz, 1e-20)
                return (x, r_n, z_n, z_n + beta * p_), None

            (dx_l, _, _, _), _ = jax.lax.scan(
                pcg_step, (dx_l, r_cg, z_cg, z_cg), None,
                length=opts.pcg_iters)
        dx_l = dx_l * mp_free[:, None]

        new_states = states_c.retract(dx_p.reshape(n, DOF))
        new_points = points_c + dx_l

        if opts.adapt:
            new_chi2 = _chi2_only(new_states, new_points, prob, cam, Rcb, tcb,
                                  opts, axis=axis, slot_k=slot_k)

            # Backtracking fallback when the full step is rejected: along a
            # soft mode (e.g. the monocular global-scale mode an inertial
            # residual set must anneal) the GN DIRECTION is right but the
            # magnitude overshoots the linearization; growing lambda
            # reshapes the step away from the very mode that must move, so
            # LM crawls (measured: 15% scale recovery in 100 iterations).
            # Trying the same direction at alpha = 1/4 and 1/16 converges
            # the quadratic-mode geometry in a handful of iterations. The
            # cond keeps the extra chi2 evaluations off the accepted-step
            # path entirely.
            def _try_alpha(alpha):
                st_a = states_c.retract(alpha * dx_p.reshape(n, DOF))
                pts_a = points_c + alpha * dx_l
                c_a = _chi2_only(st_a, pts_a, prob, cam, Rcb, tcb, opts,
                                 axis=axis, slot_k=slot_k)
                return st_a, pts_a, c_a

            def _backtrack(_):
                st2, pts2, c2 = _try_alpha(jnp.asarray(0.25, dtype))
                st3, pts3, c3 = _try_alpha(jnp.asarray(0.0625, dtype))
                pick2 = c2 <= c3
                st_b = jax.tree.map(
                    lambda a, b: jnp.where(pick2, a, b), st2, st3)
                return st_b, jnp.where(pick2, pts2, pts3), \
                    jnp.minimum(c2, c3)

            def _full(_):
                return new_states, new_points, new_chi2

            if opts.backtrack:  # static (see BAOptions.backtrack)
                cand_states, cand_points, cand_chi2 = jax.lax.cond(
                    new_chi2 < chi2, _full, _backtrack, None)
            else:
                cand_states, cand_points, cand_chi2 = (
                    new_states, new_points, new_chi2)
            accept = cand_chi2 < chi2
            import os as _os
            if _os.environ.get("PPG_BA_DEBUG"):
                _, _, c_tiny = _try_alpha(jnp.asarray(1.0 / 1024, dtype))
                jax.debug.print(
                    "iter chi2={c} new={nc} cand={cc} tiny={t} lam={l} "
                    "|dxp|={dp} |dxl|={dl}",
                    c=chi2, nc=new_chi2, cc=cand_chi2, t=c_tiny, l=lam,
                    dp=jnp.linalg.norm(dx_p), dl=jnp.linalg.norm(dx_l))
            full_ok = new_chi2 < chi2
            states_n = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), cand_states, states_c)
            points_n = jnp.where(accept, cand_points, points_c)
            # lambda policy: full-step accept halves (standard LM);
            # backtracked accept keeps lambda (the full step at this lambda
            # still overshoots — halving would re-reject next iteration);
            # total reject grows it.
            lam_n = jnp.where(full_ok, lam * 0.5,
                              jnp.where(accept, lam, lam * 4.0))
            return (states_n, points_n, lam_n, jnp.where(accept, cand_chi2,
                                                         chi2)), chi2
        return (new_states, new_points, lam, chi2), chi2

    init = (states, points, jnp.asarray(opts.lambda0, dtype),
            jnp.asarray(jnp.inf, dtype))
    # Bounded while_loop (runtime `opts.iters` bound — a fixed bound would
    # fork one program per iteration count) with g2o-style small-gain
    # termination: stop once an ACCEPTED step improves chi2 by < tol
    # (relative) twice in a row. Rejected LM steps are part of the lambda
    # search, not convergence — they don't count as stalls, but 16
    # consecutive rejections (lambda grew 4^16x without one accept) also
    # stop. The cap was 6, which aborted solves whose FIRST exact-GN step
    # overshoots a soft mode (measured: FIBA on a mis-scaled map needs
    # lambda to climb ~6 decades from its post-accept floor before the
    # damped step lands, i.e. ~10 consecutive rejections — the old cap
    # froze the solve at iteration 7 with chi2 untouched; g2o's Levenberg
    # likewise retries up to 10 lambdas per iteration). tol == 0 disables
    # both exits (always runs `iters`, matching the old scan path).
    hist0 = jnp.zeros(MAX_HIST, dtype)
    rej_cap = jnp.where(opts.tol > 0, 16, opts.iters + 1)

    def w_cond(c):
        it, _, _, _, _, stall, rej, _ = c
        return (it < opts.iters) & (stall < 2) & (rej < rej_cap)

    def w_body(c):
        it, st, pts, lam, last, stall, rej, hist = c
        (st2, pts2, lam2, chi2_acc), chi2_pre = solve_iter(
            (st, pts, lam, last), None)
        hist = hist.at[jnp.minimum(it, MAX_HIST - 1)].set(chi2_pre)
        accepted = chi2_acc < last
        rel_gain = (last - chi2_acc) / jnp.maximum(chi2_acc, 1e-20)
        small = rel_gain < opts.tol
        stall = jnp.where(accepted, jnp.where(small, stall + 1, 0),
                          stall)
        rej = jnp.where(accepted, 0, rej + 1)
        return (it + 1, st2, pts2, lam2, chi2_acc, stall, rej, hist)

    it_f, states_f, points_f, lam_f, final_chi2, _, _, chi2_hist = (
        jax.lax.while_loop(
            w_cond, w_body,
            (jnp.asarray(0, jnp.int32), init[0], init[1], init[2],
             init[3], jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32), hist0)))
    # unexecuted slots hold the final accepted chi2 so hist stays
    # monotone-looking for diagnostics ([-1] == converged value)
    chi2_hist = jnp.where(jnp.arange(MAX_HIST) < it_f, chi2_hist,
                          final_chi2)
    iters_run = it_f

    # final per-observation chi2 + depth for outlier classification
    mk_f = m * slot_k
    E_kf_f = _onehot(prob.r_kf, n, dtype)
    E_mp_f = (_onehot(prob.r_mp, m, dtype) if slot_k == 0
              else (_onehot(prob.r_mp[mk_f:], m, dtype)
                    if prob.r_mp.shape[0] > mk_f else None))
    r_f, obs_depth, _, _ = _reproj_batch(
        cam, Rcb, tcb, _sel(E_kf_f, states_f.R, prob.r_kf),
        _sel(E_kf_f, states_f.t, prob.r_kf),
        _mp_gather(points_f, prob.r_mp, E_mp_f, slot_k), prob.r_uv,
        want_jac=False)
    obs_chi2_v = jnp.sum(r_f * r_f, axis=1)
    return states_f, points_f, dict(chi2_hist=chi2_hist,
                                    final_chi2=final_chi2, lam=lam_f,
                                    iters_run=iters_run,
                                    obs_chi2=obs_chi2_v, obs_depth=obs_depth)
