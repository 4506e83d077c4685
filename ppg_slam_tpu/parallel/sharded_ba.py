"""Multi-chip scaling: the FULL bundle-adjustment solver over a device mesh.

The reference is single-process (SURVEY.md §2.8); the TPU-native scale-out
path shards the dominant BA work — residual linearization and normal-equation
assembly — across devices with `shard_map` and psum-reduces over ICI, while
the small dense pose solve stays replicated. Unlike a visual-only demo, this
runs `estimator.ba_core.solve_ba` itself with a mesh axis: EVERY residual
family (reprojection, colines incl. their PCG cross-term matvecs, inertial
links, bias random walks, 15-D priors, bias priors), the robust IRLS weights,
and the damped accept/reject LM loop — so 8-device results equal 1-device
results bit-for-bit-modulo-reduction-order (tests/test_parallel.py).

Sharding layout: KF states / landmarks / masks replicate (the pose-state
dimension is small); each BAProblem residual family shards on its leading
(observation) dimension, the axis that grows with map size. For small KF
buckets the dense-W reduced solve psums O(N15^2 + M landmark blocks + W
cross blocks) per iteration; at/above ba._implicit_min_n() KFs the solver
switches to the IMPLICIT Schur path (`_shard_obs_layout`): each shard's
local observation block is rebuilt as its own slot-major layout + kf-major
permutation, the CG matvecs stay shard-local, and the per-iteration
collective shrinks to the matvecs' (M, 3)/(N, 6) results — O(M + N),
independent of both observation count AND the dense W footprint.

Entry: `estimator.ba.global_bundle_adjustment(..., mesh=)` /
`full_inertial_ba(..., mesh=)` route here; `solve_ba_sharded` is the direct
solver-level API.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..estimator.ba_core import (BAOptions, BAProblem, KFStates, DOF,
                                 empty_problem, solve_ba)
from ..geometry.cameras import CAM_PINHOLE, CameraModel

AXIS = "dp"

# BAProblem residual families and their leading-dim group:
#   O: reprojection, C: colines, L: inertial + bias walks, P: priors, B: bias
_FAMILY_OF = dict(
    r_kf="O", r_mp="O", r_uv="O", r_valid="O",
    c_idx="C", c_w="C", c_valid="C",
    i_kf1="L", i_kf2="L", i_dR="L", i_dV="L", i_dP="L", i_JRg="L",
    i_JVg="L", i_JVa="L", i_JPg="L", i_JPa="L", i_b0="L", i_sqi="L",
    i_dt="L", i_valid="L", i_huber="L", rw_sqig="L", rw_sqia="L",
    rw_valid="L",
    p_kf="P", p_R="P", p_t="P", p_v="P", p_bg="P", p_ba="P", p_sqi="P",
    p_valid="P",
    bp_kf="B", bp_wg="B", bp_wa="B", bp_valid="B",
)


def pad_problem_for_mesh(prob: BAProblem, n_dev: int) -> BAProblem:
    """Pad every residual family's leading dim to a multiple of n_dev with
    invalid (masked) slots so shards are equal-sized."""
    sizes = {}
    for name in BAProblem._fields:
        fam = _FAMILY_OF[name]
        n = getattr(prob, name).shape[0]
        sizes.setdefault(fam, n)
    pads = {f: (-(-n // n_dev)) * n_dev - n for f, n in sizes.items()}
    if not any(pads.values()):
        return prob
    ext = empty_problem(n_obs=pads["O"], n_col=pads["C"], n_links=pads["L"],
                        n_priors=pads["P"], n_bp=pads["B"])
    out = {}
    for name in BAProblem._fields:
        a = getattr(prob, name)
        e = getattr(ext, name)
        out[name] = jnp.concatenate([a, e.astype(a.dtype)]) \
            if e.shape[0] else a
    return BAProblem(**out)


@functools.lru_cache(maxsize=8)
def _sharded_solver(mesh: Mesh, slot_k: int = 0):
    """One jitted shard_map solver per (mesh, slot_k): camera and options
    travel as replicated pytree args (runtime leaves), so every BA flavor/
    calibration shares this single program per shape bucket.

    slot_k == 0: flat layout, dense-W reduced solve (W psums per iter —
    fine for small KF buckets). slot_k > 0: IMPLICIT Schur — each shard's
    local observation block is a valid slot-major layout (built by
    `_shard_obs_layout`) and the per-shard kf-major permutation rides two
    extra sharded args; the per-iteration collective shrinks from the
    dense W (M, 3, N*6) to the matvecs' (M, 3)/(N, 6) psums."""
    rep = P()
    shd = P(AXIS)
    prob_spec = BAProblem(**{k: shd for k in BAProblem._fields})
    st_spec = KFStates(rep, rep, rep, rep, rep)
    info_spec = dict(chi2_hist=rep, final_chi2=rep, lam=rep, iters_run=rep,
                     obs_chi2=shd, obs_depth=shd)

    if slot_k:
        in_specs = (st_spec, rep, prob_spec, rep, rep, rep, rep, shd, shd,
                    rep, rep)

        def body(states, points, prob, kf_dof, mp_free, Rcb, tcb, perm,
                 pmask, cam, opts):
            return solve_ba(states, points, prob, kf_dof, mp_free, Rcb,
                            tcb, cam, opts, axis=AXIS, slot_k=slot_k,
                            kfm=(perm, pmask))
    else:
        in_specs = (st_spec, rep, prob_spec, rep, rep, rep, rep, rep, rep)

        def body(states, points, prob, kf_dof, mp_free, Rcb, tcb, cam,
                 opts):
            return solve_ba(states, points, prob, kf_dof, mp_free, Rcb,
                            tcb, cam, opts, axis=AXIS)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=(st_spec, rep, info_spec))
    return jax.jit(fn)


def _shard_obs_layout(prob: BAProblem, n_dev: int, M: int, N: int):
    """Per-shard slot-major relayout of the reprojection family (host numpy).

    Rebuilds the O family as n_dev equal blocks of M*K + T rows — each
    block itself a valid slot-major layout (ba._slot_layout) over that
    shard's observations, with a flat overflow tail — plus per-shard
    kf-major permutations (ba._kfm_layout) whose indices are LOCAL to the
    block, so inside shard_map every gather in solve_ba's implicit Schur
    matvec stays shard-local and only the (M, 3)/(N, 6) matvec results
    psum. Each landmark's observations are spread round-robin across
    shards, so the common slot count K ~= pow2(ceil(max obs per landmark /
    n_dev)).

    Returns (r_kf, r_mp, r_uv, r_valid, perm, pmask, K, rowmap) where
    rowmap[i] = new GLOBAL row of input observation i (-1 for invalid
    rows) — used to return per-obs solve stats in the caller's layout."""
    from ..estimator.ba import _kfm_layout, _pow2, _slot_layout

    r_kf = np.asarray(prob.r_kf)
    r_mp = np.asarray(prob.r_mp)
    r_uv = np.asarray(prob.r_uv)
    r_val = np.asarray(prob.r_valid)
    idx = np.nonzero(r_val)[0]
    # round-robin within landmark-sorted order: per-shard per-landmark
    # counts become ~ceil(count / n_dev), minimizing the common K
    idx = idx[np.argsort(r_mp[idx], kind="stable")]
    groups = [idx[g::n_dev] for g in range(n_dev)]

    kmax = 1
    for g in groups:
        if len(g):
            kmax = max(kmax, int(np.bincount(r_mp[g], minlength=M).max()))
    K = min(1 << max(2, (kmax - 1).bit_length()), 32)
    rows_g, tmax, smax = [], 0, 1
    for g in groups:
        rows, _, n_tail = _slot_layout(r_mp[g], M, K=K)
        rows_g.append(rows)
        tmax = max(tmax, n_tail)
        if len(g):
            smax = max(smax, int(np.bincount(r_kf[g], minlength=N).max()))
    T = _pow2(tmax, lo=16) if tmax else 0
    O_local = M * K + T
    S = _pow2(smax, lo=64)

    new_kf = np.zeros((n_dev, O_local), np.int32)
    # slot-region r_mp must be row//K (the solver's slot gathers assume
    # it); tail rows default to 0 and are masked by r_valid
    new_mp = np.zeros((n_dev, O_local), np.int32)
    new_mp[:, : M * K] = (np.arange(M * K, dtype=np.int64) // K)
    new_uv = np.zeros((n_dev, O_local, 2), np.float32)
    new_val = np.zeros((n_dev, O_local), bool)
    rowmap = np.full(r_val.shape[0], -1, np.int64)
    perms, masks = [], []
    for gi, (g, rows) in enumerate(zip(groups, rows_g)):
        new_kf[gi][rows] = r_kf[g]
        new_mp[gi][rows] = r_mp[g]
        new_uv[gi][rows] = r_uv[g]
        new_val[gi][rows] = True
        rowmap[g] = gi * O_local + rows
        p, pm = _kfm_layout(new_kf[gi], new_val[gi], N, S=S)
        perms.append(p)
        masks.append(pm)
    return (new_kf.reshape(-1), new_mp.reshape(-1),
            new_uv.reshape(-1, 2), new_val.reshape(-1),
            np.concatenate(perms), np.concatenate(masks), K, rowmap)


def solve_ba_sharded(states: KFStates, points, prob: BAProblem, kf_dof,
                     mp_free, Rcb, tcb, cam: CameraModel, opts: BAOptions,
                     mesh: Mesh, implicit: Optional[bool] = None):
    """solve_ba over a device mesh: identical signature/semantics, residual
    families sharded on the mesh's first axis, states replicated.

    implicit: None = auto — route the reduced-pose solve through the
    IMPLICIT Schur path (per-shard slot-major relayout, O(M+N) psums per
    CG matvec instead of the dense W (M, 3, N*6) every iteration) when the
    KF bucket is at/above ba._implicit_min_n() and the pose solve resolves
    to CG. True/False forces. Per-obs info stats (obs_chi2 / obs_depth)
    are returned in the CALLER's observation-row order either way."""
    from ..estimator.ba import _implicit_min_n
    from ..estimator.ba_core import _resolve_pose_cg

    n_dev = int(np.prod(list(mesh.shape.values())))
    if implicit is None:
        implicit = (states.R.shape[0] >= _implicit_min_n()
                    and _resolve_pose_cg(opts.pose_cg_iters) > 0)
    shard = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    put = lambda a: jax.device_put(jnp.asarray(a), rep)
    kfm_args = ()
    K = 0
    rowmap = None
    if implicit:
        (o_kf, o_mp, o_uv, o_val, perm, pmask, K, rowmap) = \
            _shard_obs_layout(prob, n_dev, points.shape[0],
                              states.R.shape[0])
        prob = prob._replace(
            r_kf=jnp.asarray(o_kf), r_mp=jnp.asarray(o_mp),
            r_uv=jnp.asarray(o_uv), r_valid=jnp.asarray(o_val))
        kfm_args = (jax.device_put(jnp.asarray(perm), shard),
                    jax.device_put(jnp.asarray(pmask), shard))
    prob = pad_problem_for_mesh(prob, n_dev)
    prob = BAProblem(**{k: jax.device_put(getattr(prob, k), shard)
                        for k in BAProblem._fields})
    states = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep),
                          states)
    solver = _sharded_solver(mesh, K)
    st, pts, info = solver(states, put(points), prob, put(kf_dof),
                           put(mp_free), put(Rcb), put(tcb), *kfm_args,
                           cam, opts)
    if rowmap is not None:
        # per-obs stats back to the caller's row order (invalid rows get
        # inert values; callers only read rows behind their obs_pos maps)
        rm = jnp.asarray(np.maximum(rowmap, 0))
        live = jnp.asarray(rowmap >= 0)
        info = dict(info,
                    obs_chi2=jnp.where(live, info["obs_chi2"][rm], 0.0),
                    obs_depth=jnp.where(live, info["obs_depth"][rm], 1.0))
    return st, pts, info


# ---------------------------------------------------------------------------
# driver dry run (also used by tests): a tiny visual-inertial problem with
# colines through the full sharded solver
# ---------------------------------------------------------------------------

def make_vi_problem(n_kf=6, n_mp=128, n_obs=256, n_col=32, seed=0,
                    noise=0.02):
    """Synthetic visual-inertial BA problem (numpy host data): a KF chain
    with reprojection observations, valid collinear triplets, inertial links
    with plausible preintegration deltas, and a prior on the first KF."""
    from ..imu import GRAVITY_VALUE

    rng = np.random.RandomState(seed)
    cam = CameraModel(kind=CAM_PINHOLE, fx=200.0, fy=200.0, cx=64.0, cy=48.0,
                      dist=(0.0, 0.0, 0.0, 0.0), width=128, height=96)
    # straight-line colinear triplets: base + k * direction
    base = np.stack([rng.uniform(-2, 2, n_col), rng.uniform(-2, 2, n_col),
                     rng.uniform(5, 9, n_col)], 1)
    d = rng.randn(n_col, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tri = np.stack([base, base + 0.3 * d, base + 0.7 * d], 1)  # (C, 3, 3)
    pts_tri = tri.reshape(-1, 3)
    n_rand = n_mp - len(pts_tri)
    assert n_rand >= 0, "n_mp must hold 3*n_col triplet points"
    pts_rand = np.stack([rng.uniform(-3, 3, n_rand), rng.uniform(-2, 2, n_rand),
                         rng.uniform(4, 10, n_rand)], 1)
    points = np.concatenate([pts_tri, pts_rand]).astype(np.float32)
    c_idx = np.arange(3 * n_col, dtype=np.int32).reshape(n_col, 3)

    dt = 0.5
    Rwb = np.broadcast_to(np.eye(3, dtype=np.float32), (n_kf, 3, 3)).copy()
    v_true = np.float32([0.4, 0.0, 0.0])
    twb = np.stack([v_true * dt * k for k in range(n_kf)]).astype(np.float32)

    r_kf = rng.randint(0, n_kf, n_obs).astype(np.int32)
    r_mp = rng.randint(0, n_mp, n_obs).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rwb[r_kf].transpose(0, 2, 1),
                   points[r_mp] - twb[r_kf])
    uv = np.stack([200.0 * Xc[:, 0] / Xc[:, 2] + 64.0,
                   200.0 * Xc[:, 1] / Xc[:, 2] + 48.0], 1)
    uv += rng.randn(n_obs, 2) * 0.3
    r_valid = Xc[:, 2] > 0.1

    n_links = n_kf - 1
    g = np.float32([0, 0, -GRAVITY_VALUE])
    prob = empty_problem(n_obs=n_obs, n_col=n_col, n_links=n_links,
                         n_priors=1, n_bp=1)
    # constant-velocity ground truth: dV = -g*dt, dP = v*dt - 0.5*g*dt^2
    dV = np.broadcast_to(-g * dt, (n_links, 3)).astype(np.float32)
    dP = np.broadcast_to(v_true * dt - 0.5 * g * dt * dt,
                         (n_links, 3)).astype(np.float32)
    prob = prob._replace(
        r_kf=jnp.asarray(r_kf), r_mp=jnp.asarray(r_mp),
        r_uv=jnp.asarray(uv.astype(np.float32)),
        r_valid=jnp.asarray(r_valid),
        c_idx=jnp.asarray(c_idx),
        c_w=jnp.full((n_col,), 30.0, jnp.float32),
        c_valid=jnp.ones(n_col, bool),
        i_kf1=jnp.arange(n_links, dtype=jnp.int32),
        i_kf2=jnp.arange(1, n_links + 1, dtype=jnp.int32),
        i_dV=jnp.asarray(dV), i_dP=jnp.asarray(dP),
        i_sqi=jnp.broadcast_to(jnp.eye(9) * 10.0, (n_links, 9, 9)
                               ).astype(jnp.float32),
        i_dt=jnp.full((n_links,), dt, jnp.float32),
        i_valid=jnp.ones(n_links, bool),
        i_huber=jnp.zeros(n_links, bool),
        rw_sqig=jnp.broadcast_to(jnp.eye(3) * 100.0, (n_links, 3, 3)
                                 ).astype(jnp.float32),
        rw_sqia=jnp.broadcast_to(jnp.eye(3) * 100.0, (n_links, 3, 3)
                                 ).astype(jnp.float32),
        rw_valid=jnp.ones(n_links, bool),
        p_kf=jnp.zeros(1, jnp.int32),
        p_R=jnp.asarray(Rwb[:1]), p_t=jnp.asarray(twb[:1]),
        p_v=jnp.broadcast_to(jnp.asarray(v_true), (1, 3)),
        p_bg=jnp.zeros((1, 3), jnp.float32),
        p_ba=jnp.zeros((1, 3), jnp.float32),
        p_sqi=jnp.broadcast_to(jnp.eye(15) * 30.0, (1, 15, 15)
                               ).astype(jnp.float32),
        p_valid=jnp.ones(1, bool),
        bp_kf=jnp.zeros(1, jnp.int32),
        bp_wg=jnp.full(1, 100.0, jnp.float32),
        bp_wa=jnp.full(1, 100.0, jnp.float32),
        bp_valid=jnp.ones(1, bool),
    )

    # perturbed initial state
    tn = twb + rng.randn(n_kf, 3).astype(np.float32) * noise
    tn[0] = twb[0]
    pn = points + rng.randn(n_mp, 3).astype(np.float32) * noise
    states = KFStates(
        R=jnp.asarray(Rwb), t=jnp.asarray(tn),
        v=jnp.broadcast_to(jnp.asarray(v_true), (n_kf, 3)) + 0.0,
        bg=jnp.zeros((n_kf, 3), jnp.float32),
        ba=jnp.zeros((n_kf, 3), jnp.float32))
    kf_dof = np.ones((n_kf, 15), bool)
    kf_dof[0, :6] = False  # gauge: first pose fixed
    return cam, states, jnp.asarray(pn), prob, jnp.asarray(kf_dof), \
        jnp.ones(n_mp, bool)


def dryrun_sharded_ba_step(mesh: Mesh) -> None:
    """Compile + run the FULL sharded VI solver (reprojection + colines +
    inertial + walks + priors, damped LM loop) on tiny shapes (driver dry
    run) — both the dense-W layout and the implicit-Schur per-shard slot
    layout (the large-bucket production route)."""
    cam, states, points, prob, kf_dof, mp_free = make_vi_problem()
    eye = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    opts = BAOptions(iters=2, lambda0=1e-2)
    st, pts, info = solve_ba_sharded(states, points, prob, kf_dof, mp_free,
                                     eye, z3, cam, opts, mesh)
    jax.block_until_ready((st, pts))
    chi2 = np.asarray(info["chi2_hist"])
    assert np.isfinite(chi2).all()
    opts_i = BAOptions(iters=2, lambda0=1e-2, pose_cg_iters=32)
    st, pts, info = solve_ba_sharded(states, points, prob, kf_dof, mp_free,
                                     eye, z3, cam, opts_i, mesh,
                                     implicit=True)
    jax.block_until_ready((st, pts))
    assert np.isfinite(np.asarray(info["chi2_hist"])).all()
