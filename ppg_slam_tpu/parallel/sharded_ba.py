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
(observation) dimension, the axis that grows with map size. Communication per
iteration is O(N15^2 + M landmark blocks + W cross blocks), independent of
observation count — the psum rides ICI.

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


@functools.lru_cache(maxsize=4)
def _sharded_solver(mesh: Mesh):
    """One jitted shard_map solver per mesh: camera and options travel as
    replicated pytree args (runtime leaves), so every BA flavor/calibration
    shares this single program per shape bucket."""
    rep = P()
    shd = P(AXIS)
    prob_spec = BAProblem(**{k: shd for k in BAProblem._fields})
    st_spec = KFStates(rep, rep, rep, rep, rep)
    info_spec = dict(chi2_hist=rep, final_chi2=rep, lam=rep, iters_run=rep,
                     obs_chi2=shd, obs_depth=shd)
    in_specs = (st_spec, rep, prob_spec, rep, rep, rep, rep, rep, rep)

    def body(states, points, prob, kf_dof, mp_free, Rcb, tcb, cam, opts):
        return solve_ba(states, points, prob, kf_dof, mp_free, Rcb, tcb,
                        cam, opts, axis=AXIS)

    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=(st_spec, rep, info_spec))
    return jax.jit(fn)


def solve_ba_sharded(states: KFStates, points, prob: BAProblem, kf_dof,
                     mp_free, Rcb, tcb, cam: CameraModel, opts: BAOptions,
                     mesh: Mesh):
    """solve_ba over a device mesh: identical signature/semantics, residual
    families sharded on the mesh's first axis, states replicated."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    prob = pad_problem_for_mesh(prob, n_dev)
    shard = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    prob = BAProblem(**{k: jax.device_put(getattr(prob, k), shard)
                        for k in BAProblem._fields})
    states = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep),
                          states)
    put = lambda a: jax.device_put(jnp.asarray(a), rep)
    solver = _sharded_solver(mesh)
    return solver(states, put(points), prob, put(kf_dof), put(mp_free),
                  put(Rcb), put(tcb), cam, opts)


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
    run)."""
    cam, states, points, prob, kf_dof, mp_free = make_vi_problem()
    opts = BAOptions(iters=2, lambda0=1e-2)
    st, pts, info = solve_ba_sharded(
        states, points, prob, kf_dof, mp_free,
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        cam, opts, mesh)
    jax.block_until_ready((st, pts))
    chi2 = np.asarray(info["chi2_hist"])
    assert np.isfinite(chi2).all()
