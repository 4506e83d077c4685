"""BA entry points: snapshot the worldmap into SoA problems, solve, write back.

TPU counterparts of the reference's static Optimizer::* entry points
(SURVEY.md §2.4): each function gathers the reference's exact window/fixed-set
selection into a padded BAProblem, runs the jitted batched GN/LM solver
(ba_core.solve_ba) and applies the reference's post-passes (chi2 observation
erasure, MapEdge re-validation, coline outlier culling).

Flavors:
  * local_bundle_adjustment     — OptimizerLBA.cpp:35-329 (LM l0=100, 10 its,
    Cauchy reproj sqrt(5.991), Huber coline sqrt(7.815))
  * local_inertial_ba           — OptimizerLBA.cpp:354-846 (<=50-KF temporal
    window, <=200 single fixed observers, l0=1e-2/1e0, depth-aware chi2)
  * global_bundle_adjustment    — OptimizerGBA.cpp:24-289 (results to the GBA
    scratch fields when loop_kf != 0)
  * full_inertial_ba            — OptimizerGBA.cpp:291-683 (bInit: shared bias
    emulated with rigid random-walk links; priors on the last KF)
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..worldmap.elements import MapColine, MapPoint
from ..worldmap.frame import KeyFrame, Rig
from ..worldmap.map import Map
from .ba_core import BAOptions, BAProblem, KFStates, solve_ba

CHI2_MONO = 5.991


def _pow2(n: int, lo: int = 64) -> int:
    n = max(n, 1)
    return max(lo, 1 << (n - 1).bit_length())


@functools.lru_cache(None)
def _coarse_buckets() -> bool:
    """Every new (N, M, O, C) bucket combination costs a multi-second XLA
    compile on EVERY backend (profiled: 8-12 distinct local-BA buckets over
    one growing 48-frame run dominated live latency on TPU; on the 1-core
    CPU CI host each local-BA bucket compiles in ~11 s and dominated the
    tracked-fixture test modules), so pad to coarse floors everywhere: a
    2x-padded assembly costs ~2 ms more device time on TPU / well under a
    second on CPU, orders of magnitude below one compile — and a single
    shared bucket lets all pipeline modules in one test process reuse one
    compiled program. PPG_FINE_BUCKETS=1 restores fine pow2 buckets (A/B
    debugging)."""
    import os

    return not os.environ.get("PPG_FINE_BUCKETS")


@functools.lru_cache(None)
def _obs_floor() -> int:
    """Observation-slot floor. On accelerators 4096 (bench-tuned: the live
    LBA window is ~4-8k obs and device time scales with the padded shape);
    on the CPU test backend 2048. The CPU floor was 8192 when every (shape,
    flavor, camera) combination forked its own program; with BAOptions/
    CameraModel as pytrees only SHAPES fork, so a test process pays for at
    most ~3 obs buckets (2k/4k/8k, ~14 s each) while the many small-window
    solves of the tracked fixtures run ~5x faster (measured 0.91 s ->
    0.18 s per 6-iter solve on the 1-core CI host; A/B full-suite runs:
    2048 floor 837 s vs 4096 floor 897 s vs 8192 floor 892 s)."""
    import jax

    return 4096 if jax.default_backend() != "cpu" else 2048


@functools.lru_cache(None)
def _kf_mp_floors() -> tuple:
    """(KF-slot, MP-slot) floors. Accelerators keep the bench-tuned 16/512
    local-window floors; the CPU test backend floors at (32, 1024): local
    windows of the tracked fixtures stay in the 32-KF bucket (solves ~5x
    cheaper than the old 64-KF floor), and only a large-map GBA crosses
    into a second KF bucket — one extra ~14 s compile per process, paid
    once now that BA flavors/cameras share programs (pytree options)."""
    import jax

    return (16, 512) if jax.default_backend() != "cpu" else (32, 1024)


def _bucket_nm(n: int, m: int) -> Tuple[int, int]:
    """Padded (KF, MP) slot counts — the shared bucket formula used by both
    the problem assembler (slot layout needs the padded M up front) and
    _padded_solve (states/points padding)."""
    import os

    if os.environ.get("PPG_NO_PAD"):
        return n, m
    coarse = _coarse_buckets()
    kf_lo, mp_lo = _kf_mp_floors()
    return (_pow2(n, lo=kf_lo if coarse else 4),
            _pow2(m, lo=mp_lo if coarse else 128))


def _use_slots() -> bool:
    """Slot-major observation layout (ba_core.solve_ba slot_k>0) — the
    large-window scaling fix — is used exactly where the one-hot MXU
    assembly runs: on the CPU scatter path slotting only inflates the
    padded obs count without removing any matmul. PPG_SLOTS=0/1 forces."""
    import os

    v = os.environ.get("PPG_SLOTS")
    if v is not None:
        return v == "1"
    from .ba_core import _use_onehot

    return _use_onehot()


def _slot_layout(r_mp: np.ndarray, M: int, K: int = None):
    """Slot-major observation placement: row = mp*K + rank for the first K
    observations of each landmark (K = pow2 of the max per-landmark count,
    4..32), overflow observations appended as a flat tail. Returns
    (rows, slot_k, n_tail): rows[i] is the solver row of observation i.
    K may be forced (parallel/sharded_ba.py needs a COMMON slot count
    across per-shard layouts); observations past rank K-1 overflow into
    the tail either way."""
    n = len(r_mp)
    counts = np.bincount(r_mp, minlength=M) if n else np.zeros(M, np.int64)
    kmax = int(counts.max()) if n else 0
    if K is None:
        K = min(1 << max(2, (max(kmax, 1) - 1).bit_length()), 32)
    order = np.argsort(r_mp, kind="stable")
    sorted_mp = r_mp[order]
    starts = np.zeros(M, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    rank = np.arange(n) - starts[sorted_mp]
    ov = rank >= K
    rows_sorted = sorted_mp.astype(np.int64) * K + np.minimum(rank, K - 1)
    rows_sorted[ov] = M * K + np.arange(int(ov.sum()))
    rows = np.empty(n, np.int64)
    rows[order] = rows_sorted
    return rows, K, int(ov.sum())


def _implicit_min_n() -> int:
    """KF-bucket threshold above which the reduced-pose solve switches to
    the implicit Schur path (solve_ba kfm=...): the dense W fold is
    O(M * (N*6)^2) and measured 3.1/10.1/19.7 device-ms/iter at 64/128/200
    KFs (r4 solver table), while the implicit matvecs are O(obs) per CG
    iteration. Env override PPG_BA_IMPLICIT_MIN_N (tests force it low for
    CPU-size equivalence coverage; a huge value disables)."""
    import os

    try:
        return int(os.environ.get("PPG_BA_IMPLICIT_MIN_N", "128"))
    except ValueError:
        return 128


def _kfm_layout(r_kf: np.ndarray, r_valid: np.ndarray, N: int,
                S: int = None):
    """Kf-major observation permutation for the implicit Schur matvec:
    returns (perm, mask) of shape (N*S,) with S = pow2(max obs per KF) —
    perm[kf*S + j] indexes the j-th observation of keyframe kf in the
    padded observation arrays, mask 0 marks empty slots (they point at row
    0 and are multiplied out). Host-side numpy, O(obs). S may be forced
    (the sharded path needs a common S across per-shard layouts)."""
    r_kf = np.asarray(r_kf)
    r_valid = np.asarray(r_valid)
    idx = np.nonzero(r_valid)[0]
    kfs = r_kf[idx]
    counts = np.bincount(kfs, minlength=N) if len(idx) else np.zeros(
        N, np.int64)
    if S is None:
        S = _pow2(int(counts.max()) if len(idx) else 1, lo=64)
    order = np.argsort(kfs, kind="stable")
    sorted_idx = idx[order]
    sorted_kf = kfs[order]
    starts = np.zeros(N, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    rank = np.arange(len(idx)) - starts[sorted_kf]
    slot = sorted_kf.astype(np.int64) * S + rank
    perm = np.zeros(N * S, np.int32)
    mask = np.zeros(N * S, np.float32)
    perm[slot] = sorted_idx.astype(np.int32)
    mask[slot] = 1.0
    return perm, mask


def _sqrt_info_psd(M: np.ndarray) -> np.ndarray:
    """PSD-projected inverse square root used for whitening (the reference
    PSD-projects Info = C^-1, G2oEdge.cpp EdgeInertial ctor)."""
    M = 0.5 * (M + M.T).astype(np.float64)
    info = np.linalg.inv(M + 1e-14 * np.eye(len(M)))
    w, V = np.linalg.eigh(0.5 * (info + info.T))
    w = np.clip(w, 0.0, None)
    return ((V * np.sqrt(w)) @ V.T).astype(np.float32)


def _padded_solve(states: KFStates, points, prob, kf_dof, mp_free, rig,
                  opts, abort_check=None, chunk: int = 2, mesh=None,
                  slot_k: int = 0):
    """solve_ba with KF/MP slot counts padded to pow2 buckets.

    mesh: optional jax.sharding.Mesh — routes the solve through the
    residual-sharded multi-chip solver (parallel/sharded_ba.py), same
    semantics (full residual set, damped accept/reject loop, abort
    chunking).

    Local windows grow by a few KFs/MPs per call; without slot padding every
    solve_ba call sees fresh (N, M) shapes and triggers a full XLA
    recompilation (~1 s each — 77 compiles in a 24-frame pipeline run,
    profiled). Padded KF slots are identity states with all DoF fixed;
    padded MP slots sit at [0,0,1] with mp_free=False and appear in no
    observation, so they are inert under the damped Schur solve."""
    import os

    n = int(kf_dof.shape[0])
    m = int(mp_free.shape[0])
    N, M = _bucket_nm(n, m)
    if N != n:
        # numpy padding: device-side concatenates compile one program per
        # (n -> N) shape pair — states/points arrive as numpy from the
        # host gatherers precisely so this stays compile-free
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (N - n, 3, 3))
        z = np.zeros((N - n, 3), np.float32)
        cat = (np.concatenate if isinstance(states.R, np.ndarray)
               else jnp.concatenate)
        states = KFStates(
            cat([states.R, eye]), cat([states.t, z]), cat([states.v, z]),
            cat([states.bg, z]), cat([states.ba, z]))
        kf_dof = np.concatenate([kf_dof, np.zeros((N - n, 15), bool)])
    if M != m:
        pts_pad = np.tile(np.float32([0.0, 0.0, 1.0]), (M - m, 1))
        cat = (np.concatenate if isinstance(points, np.ndarray)
               else jnp.concatenate)
        points = cat([points, pts_pad])
        mp_free = np.concatenate([mp_free, np.zeros(M - m, bool)])
    args = (prob, np.asarray(kf_dof), np.asarray(mp_free),
            rig.Rcb, rig.tcb, rig.cam)
    if mesh is not None:
        # the incoming (slot-major or flat) layout is treated as flat; the
        # sharded solver re-lays-out observations per shard itself when the
        # KF bucket warrants the implicit Schur path (solve_ba_sharded
        # implicit=None auto-routing)
        from ..parallel.sharded_ba import solve_ba_sharded

        def _solve(st_, pts_, o, **kw):
            return solve_ba_sharded(st_, pts_, *args, o, mesh, **kw)
    else:
        from .ba_core import _resolve_pose_cg

        kfm = None
        if slot_k and N >= _implicit_min_n():
            kfm = _kfm_layout(prob.r_kf, prob.r_valid, N)

        def _solve(st_, pts_, o, **kw):
            # the implicit path solves the reduced system by CG only —
            # skip it for flavors that resolved to dense Cholesky
            k2 = dict(kw)
            if kfm is not None and _resolve_pose_cg(o.pose_cg_iters):
                k2["kfm"] = kfm
            return solve_ba(st_, pts_, *args, o, slot_k=slot_k, **k2)
    def _start_fetch(st, pts, info):
        """Enqueue the D2H of every array the host post-pass reads right
        after the solve dispatch — a late synchronous fetch serializes
        behind all queued device work on tunneled links."""
        for x in (*st, pts, info.get("obs_chi2"), info.get("obs_depth"),
                  info.get("chi2_hist"), info.get("iters_run"),
                  info.get("final_chi2")):
            try:
                x.copy_to_host_async()
            except Exception:
                pass

    if abort_check is None or opts.iters <= chunk:
        from ..utils import profiler

        with profiler.timer("ba.dispatch"):
            st, pts, info = _solve(states, points, opts)
        with profiler.timer("ba.startfetch"):
            _start_fetch(st, pts, info)
    else:
        # interruptible solve: run the damped-GN loop in fixed-size chunks,
        # checking the abort flag between chunks — the TPU equivalent of the
        # reference's force-stop flag polled inside g2o's LM loop
        # (OptimizerLBA.cpp:112-113; set by InsertKeyFrame,
        # LocalMapping.cpp:368-431). Chunk size is constant and lam0 is
        # always a traced array (including the first chunk) so ALL chunks
        # share one compiled program per shape bucket.
        import dataclasses as _dc

        done = 0
        lam = jnp.asarray(opts.lambda0, jnp.float32)
        st, pts = states, points
        info = None
        prev_chi2 = np.inf
        stalled_chunks = 0
        while done < opts.iters:
            # resume damping through opts.lambda0 (a runtime pytree leaf —
            # passing the previous chunk's device scalar keeps one shared
            # compiled program and costs no host sync)
            st, pts, info = _solve(st, pts,
                                   _dc.replace(opts, iters=chunk,
                                               lambda0=lam))
            _start_fetch(st, pts, info)
            lam = info["lam"]
            # the inner while_loop can exit before `chunk` iterations when
            # opts.tol > 0 — count what actually ran, not the nominal size
            done += int(info["iters_run"])
            chi2 = float(info["final_chi2"])
            if chi2 < prev_chi2 and chi2 > (1.0 - opts.tol) * prev_chi2:
                break  # converged: accepted progress with small gain
            # a chunk with NO accepted step is lambda search, not
            # convergence — allow 8 such chunks (16 rejected iterations,
            # matching the solver's own rejection cap: a soft-mode
            # overshoot legitimately needs lambda to climb several decades
            # before the damped step lands) before giving up
            stalled_chunks = stalled_chunks + 1 if chi2 >= prev_chi2 else 0
            if stalled_chunks >= 8:
                break
            prev_chi2 = min(chi2, prev_chi2)
            if done < opts.iters and abort_check():
                info["aborted"] = True
                break
        info["iters_run"] = done
    # Return the PADDED states/points: slicing device arrays here compiles
    # one eager dynamic-slice program per (padded, real) shape pair (41 in
    # a 48-frame run, profiled). Every consumer iterates host object lists
    # (kfs / mps), so rows past n / m are simply never read.
    return st, pts, info


def _body_states(kfs: List[KeyFrame], rig: Rig) -> KFStates:
    """Numpy-backed states: the jit call stages the H2D transfer; keeping
    host data in numpy lets _padded_solve pad with np.concatenate (a
    device-side concatenate compiles one XLA program PER padding shape —
    ~40 such programs per tracked-map run, profiled)."""
    R = np.stack([kf.imu_rotation() for kf in kfs])
    t = np.stack([kf.imu_position() for kf in kfs])
    v = np.stack([kf.velocity for kf in kfs])
    bg = np.stack([kf.bias[:3] for kf in kfs])
    ba = np.stack([kf.bias[3:] for kf in kfs])
    return KFStates(R.astype(np.float32), t.astype(np.float32),
                    v.astype(np.float32), bg.astype(np.float32),
                    ba.astype(np.float32))


def _write_back_poses(kfs: List[KeyFrame], states: KFStates, rig: Rig,
                      free: np.ndarray, velocities: bool) -> None:
    R = np.asarray(states.R)
    t = np.asarray(states.t)
    v = np.asarray(states.v)
    bg = np.asarray(states.bg)
    ba = np.asarray(states.ba)
    for i, kf in enumerate(kfs):
        if not free[i]:
            continue
        Rbw = R[i].T
        tbw = -Rbw @ t[i]
        kf.set_pose(rig.Rcb @ Rbw, rig.Rcb @ tbw + rig.tcb)
        if velocities:
            kf.velocity = v[i].copy()
            kf.bias = np.concatenate([bg[i], ba[i]]).astype(np.float32)


def _gather_reproj(kfs: List[KeyFrame], kf_index: Dict[int, int],
                   mps: List[MapPoint], mp_index: Dict[int, int]
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """Observation triplets (kf_slot, mp_slot, uv) over the local window."""
    r_kf, r_mp, r_uv, refs = [], [], [], []
    for mp in mps:
        j = mp_index[mp.mnId]
        for kf, idx in mp.observations.items():
            i = kf_index.get(kf.mnId)
            if i is None or kf.is_bad():
                continue
            r_kf.append(i)
            r_mp.append(j)
            r_uv.append(kf.kp[idx])
            refs.append((kf, mp, idx))
    if not r_kf:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros((0, 2), np.float32), [])
    return (np.asarray(r_kf, np.int32), np.asarray(r_mp, np.int32),
            np.asarray(r_uv, np.float32), refs)


def _gather_colines(wmap: Map, mp_index: Dict[int, int]
                    ) -> Tuple[np.ndarray, np.ndarray, list]:
    idx, w, refs = [], [], []
    for mc in wmap.map_colines:
        if mc.is_bad() or not mc.valid:
            continue
        a = mp_index.get(mc.mp_s.mnId)
        b = mp_index.get(mc.mp_m.mnId)
        c = mp_index.get(mc.mp_e.mnId)
        if a is None or b is None or c is None:
            continue
        idx.append((a, b, c))
        w.append(mc.ave_weight())
        refs.append(mc)
    if not idx:
        return np.zeros((0, 3), np.int32), np.zeros(0, np.float32), []
    return np.asarray(idx, np.int32), np.asarray(w, np.float32), refs


@functools.lru_cache(maxsize=32)
def _np_problem_template(O: int, C: int, L: int, P: int, B: int):
    """Numpy mirror of ba_core.empty_problem for the host assemblers.
    Cached per shape bucket; callers must .copy() any field they write
    (the untouched all-invalid fields are shared read-only)."""
    f = lambda *s: np.zeros(s, np.float32)
    i = lambda *s: np.zeros(s, np.int32)
    b = lambda *s: np.zeros(s, bool)
    eye = lambda k, n: np.broadcast_to(np.eye(k, dtype=np.float32),
                                       (n, k, k))
    return dict(
        r_kf=i(O), r_mp=i(O), r_uv=f(O, 2), r_valid=b(O),
        c_idx=i(C, 3), c_w=f(C), c_valid=b(C),
        i_kf1=i(L), i_kf2=i(L), i_dR=eye(3, L), i_dV=f(L, 3),
        i_dP=f(L, 3), i_JRg=f(L, 3, 3), i_JVg=f(L, 3, 3),
        i_JVa=f(L, 3, 3), i_JPg=f(L, 3, 3), i_JPa=f(L, 3, 3),
        i_b0=f(L, 6), i_sqi=eye(9, L), i_dt=f(L), i_valid=b(L),
        i_huber=b(L),
        rw_sqig=eye(3, L), rw_sqia=eye(3, L), rw_valid=b(L),
        p_kf=i(P), p_R=eye(3, P), p_t=f(P, 3), p_v=f(P, 3), p_bg=f(P, 3),
        p_ba=f(P, 3), p_sqi=eye(15, P), p_valid=b(P),
        bp_kf=i(B), bp_wg=f(B), bp_wa=f(B), bp_valid=b(B),
    )


def _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w, links=None, priors=None,
                 bias_priors=None, n_mp: Optional[int] = None
                 ) -> Tuple[BAProblem, int, np.ndarray]:
    """Pad residual families to pow2 buckets. Returns (prob, slot_k,
    obs_pos): when the one-hot assembly is active and n_mp is given, the
    observations are laid out SLOT-MAJOR (ba_core slot layout; obs_pos[i]
    is the solver row of input observation i) so large windows solve with
    O(M x K x N) instead of O(obs x M x N) assembly; otherwise slot_k=0
    and obs_pos is the identity."""
    coarse = _coarse_buckets()
    n = len(r_kf)
    slot_k = 0
    obs_pos = np.arange(n, dtype=np.int64)
    if n_mp is not None and n and _use_slots():
        M = _bucket_nm(1, n_mp)[1]
        rows, slot_k, n_tail = _slot_layout(np.asarray(r_mp), M)
        O = M * slot_k + (_pow2(n_tail, lo=256 if coarse else 16)
                          if n_tail else 0)
        obs_pos = rows
    else:
        O = _pow2(n, lo=_obs_floor() if coarse else 64)
    C = _pow2(len(c_idx), lo=256 if coarse else 16)
    L = _pow2(len(links[0]) if links else 1, lo=64 if coarse else 4)
    P = 1
    B = _pow2(len(bias_priors[0]) if bias_priors else 1,
              lo=4 if coarse else 1)
    # host-side (numpy) template: building the empty problem with device
    # zeros costs one D2H round trip per copied field on tunneled links
    # (profiled at ~260 ms per local-BA assembly)
    tmpl = _np_problem_template(O, C, L, P, B)
    prob = BAProblem(**{k: v for k, v in tmpl.items()})

    def put(arr, vals, valid_name=None):
        a = tmpl[arr].copy()
        n = len(vals)
        if n:
            a[:n] = vals
        return a

    upd = {}
    if slot_k:
        rkf = np.zeros(O, np.int32)
        rkf[obs_pos] = r_kf
        # contract: r_mp[o] == o // K for every slot row (incl. padded)
        rmp = np.zeros(O, np.int32)
        rmp[: M * slot_k] = np.arange(M * slot_k, dtype=np.int64) // slot_k
        rmp[obs_pos] = r_mp
        ruv = np.zeros((O, 2), np.float32)
        ruv[obs_pos] = r_uv
        rv = np.zeros(O, bool)
        rv[obs_pos] = True
        upd["r_kf"], upd["r_mp"], upd["r_uv"], upd["r_valid"] = (
            rkf, rmp, ruv, rv)
    else:
        upd["r_kf"] = put("r_kf", r_kf)
        upd["r_mp"] = put("r_mp", r_mp)
        upd["r_uv"] = put("r_uv", r_uv)
        rv = np.zeros(O, bool)
        rv[:n] = True
        upd["r_valid"] = rv
    nc = len(c_idx)
    upd["c_idx"] = put("c_idx", c_idx)
    upd["c_w"] = put("c_w", c_w)
    cv = np.zeros(C, bool)
    cv[:nc] = True
    upd["c_valid"] = cv
    if links:
        (i_kf1, i_kf2, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, b0, sqi, dt,
         huber, sqig, sqia) = links
        nl = len(i_kf1)
        for name, vals in (("i_kf1", i_kf1), ("i_kf2", i_kf2), ("i_dR", dR),
                           ("i_dV", dV), ("i_dP", dP), ("i_JRg", JRg),
                           ("i_JVg", JVg), ("i_JVa", JVa), ("i_JPg", JPg),
                           ("i_JPa", JPa), ("i_b0", b0), ("i_sqi", sqi),
                           ("i_dt", dt), ("i_huber", huber),
                           ("rw_sqig", sqig), ("rw_sqia", sqia)):
            upd[name] = put(name, vals)
        lv = np.zeros(L, bool)
        lv[:nl] = True
        upd["i_valid"] = lv
        upd["rw_valid"] = lv.copy()
    if bias_priors:
        bp_kf, bp_wg, bp_wa = bias_priors
        nb = len(bp_kf)
        upd["bp_kf"] = put("bp_kf", bp_kf)
        upd["bp_wg"] = put("bp_wg", bp_wg)
        upd["bp_wa"] = put("bp_wa", bp_wa)
        bv = np.zeros(B, bool)
        bv[:nb] = True
        upd["bp_valid"] = bv
    return (prob._replace(**{k: jnp.asarray(v) for k, v in upd.items()}),
            slot_k, obs_pos)


def _gather_links(kfs: List[KeyFrame], kf_index: Dict[int, int],
                  soft_prev_ids: Optional[set] = None,
                  info_scale_soft: float = 1e-2):
    """Temporal preintegration links within the window (consecutive KFs).

    Links whose previous KF is in `soft_prev_ids` (the boundary link into the
    fixed past) get information x 1e-2 + Huber(sqrt 16.92), matching
    OptimizerLBA.cpp:583-589."""
    cols = [[] for _ in range(16)]
    for kf in kfs:
        prev = kf.prev_kf
        if prev is None or kf.preintegrated is None:
            continue
        i = kf_index.get(prev.mnId)
        j = kf_index.get(kf.mnId)
        if i is None or j is None:
            continue
        p = kf.preintegrated
        st = p.state
        C = np.asarray(st.C, np.float64)
        sqi = _sqrt_info_psd(C[:9, :9])
        is_last = soft_prev_ids is not None and prev.mnId in soft_prev_ids
        if is_last:
            sqi = sqi * np.sqrt(info_scale_soft)
        vals = [i, j, np.asarray(st.dR), np.asarray(st.dV), np.asarray(st.dP),
                np.asarray(st.JRg), np.asarray(st.JVg), np.asarray(st.JVa),
                np.asarray(st.JPg), np.asarray(st.JPa), p.b.copy(), sqi,
                np.float32(st.dT), bool(is_last),
                _sqrt_info_psd(C[9:12, 9:12]),
                _sqrt_info_psd(C[12:15, 12:15])]
        for c, v in zip(cols, vals):
            c.append(v)
    if not cols[0]:
        return None
    out = []
    for k, c in enumerate(cols):
        out.append(np.asarray(c))
    return out


def _apply_outlier_pass(info, refs, close_depth_aware: bool = False,
                        close_flags: Optional[np.ndarray] = None,
                        obs_pos: Optional[np.ndarray] = None) -> int:
    """Erase observations with chi2 > 5.991 or negative depth (the LBA
    post-pass, OptimizerLBA.cpp:259-?, :743-750). obs_pos maps input
    observation i -> solver row (slot-major layouts); identity if None."""
    chi2 = np.asarray(info["obs_chi2"])
    depth = np.asarray(info["obs_depth"])
    if obs_pos is None:
        chi2, depth = chi2[: len(refs)], depth[: len(refs)]
    else:
        chi2, depth = chi2[obs_pos], depth[obs_pos]
    n_bad = 0
    for k, (kf, mp, idx) in enumerate(refs):
        th = CHI2_MONO
        if close_depth_aware and close_flags is not None and close_flags[k]:
            th = 1.5 * CHI2_MONO
        if chi2[k] > th or depth[k] <= 0:
            mp.erase_observation(kf)
            n_bad += 1
    return n_bad


def _coline_edge_cleanup(wmap: Map, mps: List[MapPoint]) -> None:
    """Post-BA edge/coline validity sweep (OptimizerLBA.cpp:306-326)."""
    seen = set()
    for mp in mps:
        if mp.is_bad():
            continue
        for me in mp.get_edges():
            if me.mnId not in seen:
                seen.add(me.mnId)
                me.check_valid()
        mp.remove_coline_outliers()


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def local_bundle_adjustment(kf: KeyFrame, wmap: Map,
                            iters: int = 10, abort_check=None,
                            map_lock=None) -> None:
    """Visual local BA (OptimizerLBA.cpp:35-329). abort_check: polled
    between GN chunks (the reference's force-stop flag, :112-113).
    map_lock: held around the host gather and apply phases only, so a
    threaded local mapper's device solve overlaps tracking (the reference
    runs its g2o solve outside mMutexMapUpdate the same way). If the map's
    transform_epoch moves mid-solve (IMU init / loop correction rescaled
    the world) the write-back is dropped entirely."""
    from contextlib import nullcontext

    from ..utils import profiler

    guard = map_lock if map_lock is not None else nullcontext()
    rig = wmap.rig
    with guard, profiler.timer("lba.gather"):
        epoch0 = wmap.transform_epoch
        local = [kf] + [k for k in kf.ordered_connected if not k.is_bad()]
        local_ids = {k.mnId for k in local}
        mps: List[MapPoint] = []
        seen = set()
        for k in local:
            for mp in k.map_points:
                if mp is not None and not mp.is_bad() and mp.mnId not in seen:
                    seen.add(mp.mnId)
                    mps.append(mp)
        fixed: List[KeyFrame] = []
        fixed_ids = set()
        for mp in mps:
            for k in mp.observations:
                if k.mnId not in local_ids and k.mnId not in fixed_ids \
                        and not k.is_bad():
                    fixed_ids.add(k.mnId)
                    fixed.append(k)
        kfs = local + fixed
        if len(kfs) < 2 or not mps:
            return
        kf_index = {k.mnId: i for i, k in enumerate(kfs)}
        mp_index = {mp.mnId: j for j, mp in enumerate(mps)}

        with profiler.timer("lba.gather.states"):
            states = _body_states(kfs, rig)
            points = np.stack([mp.pos for mp in mps]).astype(np.float32)
        with profiler.timer("lba.gather.obs"):
            r_kf, r_mp, r_uv, refs = _gather_reproj(kfs, kf_index, mps,
                                                    mp_index)
            c_idx, c_w, _ = _gather_colines(wmap, mp_index)
        with profiler.timer("lba.gather.pad"):
            prob, slot_k, obs_pos = _pad_problem(r_kf, r_mp, r_uv, c_idx,
                                                 c_w, n_mp=len(mps))

        kf_dof = np.zeros((len(kfs), 15), bool)
        kf_dof[: len(local), :6] = True
        # origin KF stays fixed
        for i, k in enumerate(local):
            if wmap.kf_origin is not None and k.mnId == wmap.kf_origin.mnId:
                kf_dof[i] = False
        mp_free = np.ones(len(mps), bool)

    opts = BAOptions(iters=iters, lambda0=100.0, reproj_kernel="cauchy")
    coarse = _coarse_buckets()
    kf_lo, mp_lo = _kf_mp_floors()
    bucket = (f"lba.solve.{_pow2(len(kfs), lo=kf_lo if coarse else 4)}"
              f"x{_pow2(len(mps), lo=mp_lo if coarse else 128)}"
              f"x{prob.r_kf.shape[0]}x{prob.c_idx.shape[0]}")
    with profiler.timer(bucket), profiler.timer("lba.solve"):
        st, pts, info = _padded_solve(states, points, prob, kf_dof,
                                      np.asarray(mp_free), rig, opts,
                                      abort_check=abort_check,
                                      slot_k=slot_k)

    with profiler.timer("lba.apply"):
        with profiler.timer("lba.apply.fetch"):
            # ONE pipelined device_get for everything the host post-pass
            # reads: separate blocking np.asarray calls each pay a full
            # link round trip (profiled: 90+180 ms per local BA). Fetched
            # OUTSIDE the map lock — it is the long device wait.
            st, pts, chi2, depth = jax.device_get(
                (st, pts, info["obs_chi2"], info["obs_depth"]))
            info = dict(info, obs_chi2=chi2, obs_depth=depth)
        guard2 = map_lock if map_lock is not None else nullcontext()
        with guard2:
            if wmap.transform_epoch != epoch0:
                profiler.count("lba_dropped_stale")
                return
            with profiler.timer("lba.apply.outlier"):
                _apply_outlier_pass(info, refs, obs_pos=obs_pos)
            with profiler.timer("lba.apply.poses"):
                free = kf_dof.any(axis=1)
                _write_back_poses(kfs, st, rig, free, velocities=False)
            with profiler.timer("lba.apply.points"):
                pts_np = np.asarray(pts)
                for j, mp in enumerate(mps):
                    if not mp.is_bad():
                        mp.pos = pts_np[j].copy()
                        mp.update_normal_and_depth()
            with profiler.timer("lba.apply.colines"):
                _coline_edge_cleanup(wmap, mps)
            wmap.info_map_change()


def local_inertial_ba(kf: KeyFrame, wmap: Map, b_large: bool = False,
                      b_rec_init: bool = False, iters: int = 10,
                      abort_check=None, map_lock=None) -> None:
    """Visual-inertial local BA (OptimizerLBA.cpp:354-846). map_lock: see
    local_bundle_adjustment — gather/apply locked, device solve unlocked,
    write-back dropped on a mid-solve whole-map transform."""
    from contextlib import nullcontext

    from ..utils import profiler

    guard = map_lock if map_lock is not None else nullcontext()
    rig = wmap.rig
    with guard:
        epoch0 = wmap.transform_epoch
        max_opt = 50
        nd = min(wmap.n_keyframes() - 2, max_opt)
        window: List[KeyFrame] = [kf]
        while len(window) < nd and window[-1].prev_kf is not None:
            window.append(window[-1].prev_kf)
        local_ids = {k.mnId for k in window}

        mps: List[MapPoint] = []
        seen = set()
        for k in window:
            for mp in k.map_points:
                if mp is not None and not mp.is_bad() \
                        and mp.mnId not in seen:
                    seen.add(mp.mnId)
                    mps.append(mp)

        fixed: List[KeyFrame] = []
        fixed_ids = set()
        if window[-1].prev_kf is not None:
            fixed.append(window[-1].prev_kf)
            fixed_ids.add(window[-1].prev_kf.mnId)
        else:
            # no previous: fix the oldest window KF itself
            oldest = window.pop()
            local_ids.discard(oldest.mnId)
            fixed.append(oldest)
            fixed_ids.add(oldest.mnId)
        for mp in mps:  # ONE fixed observer per point (reference quirk)
            if len(fixed) >= 200:
                break
            for k in mp.observations:
                if k.mnId not in local_ids and k.mnId not in fixed_ids \
                        and not k.is_bad():
                    fixed_ids.add(k.mnId)
                    fixed.append(k)
                    break
        kfs = window + fixed
        if not mps or len(kfs) < 2:
            return
        kf_index = {k.mnId: i for i, k in enumerate(kfs)}
        mp_index = {mp.mnId: j for j, mp in enumerate(mps)}

        states = _body_states(kfs, rig)
        points = np.stack([mp.pos for mp in mps]).astype(np.float32)
        r_kf, r_mp, r_uv, refs = _gather_reproj(kfs, kf_index, mps, mp_index)
        c_idx, c_w, _ = _gather_colines(wmap, mp_index)
        # temporal links over window + the link into the fixed previous KF
        soft = {fixed[0].mnId} if fixed else set()
        links = _gather_links(window, kf_index, soft_prev_ids=soft)
        prob, slot_k, obs_pos = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w,
                                             links=links, n_mp=len(mps))

        kf_dof = np.zeros((len(kfs), 15), bool)
        kf_dof[: len(window), :] = True
        mp_free = np.ones(len(mps), bool)

    opts = BAOptions(iters=iters, lambda0=(1e-2 if b_large else 1e0),
                     reproj_kernel="cauchy")
    st, pts, info = _padded_solve(states, points, prob, kf_dof,
                                  np.asarray(mp_free), rig, opts,
                                  abort_check=abort_check, slot_k=slot_k)

    # one pipelined device_get for the whole host post-pass (see the
    # visual LBA above) — outside the map lock: it is the long device wait
    st, pts, chi2_np, depth_np = jax.device_get(
        (st, pts, info["obs_chi2"], info["obs_depth"]))
    info = dict(info, obs_chi2=chi2_np, obs_depth=depth_np)
    guard2 = map_lock if map_lock is not None else nullcontext()
    with guard2:
        if wmap.transform_epoch != epoch0:
            profiler.count("lba_dropped_stale")
            return
        # depth-aware chi2 (close = tracked depth < 10, :743-750); we use
        # the optimized depth as the closeness proxy
        depth = depth_np[obs_pos] if len(refs) else depth_np[:0]
        close = depth < 10.0
        _apply_outlier_pass(info, refs, close_depth_aware=True,
                            close_flags=close, obs_pos=obs_pos)
        free = kf_dof.any(axis=1)
        _write_back_poses(kfs, st, rig, free, velocities=True)
        pts_np = np.asarray(pts)
        for j, mp in enumerate(mps):
            if not mp.is_bad():
                mp.pos = pts_np[j].copy()
                mp.update_normal_and_depth()
        _coline_edge_cleanup(wmap, mps)
        wmap.info_map_change()


def global_bundle_adjustment(wmap: Map, iters: int = 20, loop_kf: int = 0,
                             robust: bool = True, abort_check=None,
                             map_lock=None, mesh=None) -> None:
    """Visual-only GBA (OptimizerGBA.cpp:24-289). map_lock (if given) guards
    the host gather/write phases so a background-thread GBA (the reference's
    RunGlobalBundleAdjustment thread, LoopClosing.cpp:1050) does not race
    tracking; the device solve runs unlocked. mesh (if given) shards the
    solve's residual set over the device mesh (parallel/sharded_ba.py)."""
    from contextlib import nullcontext

    guard = map_lock if map_lock is not None else nullcontext()
    rig = wmap.rig
    with guard:
        kfs = wmap.all_keyframes()
        mps = wmap.all_map_points()
        if len(kfs) < 2 or not mps:
            return
        kfs.sort(key=lambda k: k.mnId)
        kf_index = {k.mnId: i for i, k in enumerate(kfs)}
        mp_index = {mp.mnId: j for j, mp in enumerate(mps)}
        states = _body_states(kfs, rig)
        points = np.stack([mp.pos for mp in mps]).astype(np.float32)
        r_kf, r_mp, r_uv, refs = _gather_reproj(kfs, kf_index, mps, mp_index)
        c_idx, c_w, _ = _gather_colines(wmap, mp_index)
        prob, slot_k, _ = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w,
                                       n_mp=len(mps))

    kf_dof = np.zeros((len(kfs), 15), bool)
    kf_dof[:, :6] = True
    kf_dof[0] = False  # origin fixed
    opts = BAOptions(iters=iters, lambda0=1e-5,
                     reproj_kernel="cauchy" if robust else "none")
    st, pts, info = _padded_solve(states, points, prob, kf_dof,
                                  np.ones(len(mps), bool), rig, opts,
                                  abort_check=abort_check, mesh=mesh,
                                  slot_k=slot_k)

    st, pts = jax.device_get((st, pts))  # one pipelined fetch
    R = np.asarray(st.R)
    t = np.asarray(st.t)
    pts_np = np.asarray(pts)
    with guard:
        if loop_kf == 0:
            _write_back_poses(kfs, st, rig, np.ones(len(kfs), bool),
                              velocities=False)
            for j, mp in enumerate(mps):
                mp.pos = pts_np[j].copy()
                mp.update_normal_and_depth()
            _coline_edge_cleanup(wmap, mps)
        else:
            for i, kf in enumerate(kfs):
                Rbw = R[i].T
                tbw = -Rbw @ t[i]
                kf.gba_Rcw = rig.Rcb @ Rbw
                kf.gba_tcw = rig.Rcb @ tbw + rig.tcb
                kf.ba_global_for_kf = loop_kf
            for j, mp in enumerate(mps):
                mp.gba_pos = pts_np[j].copy()
                mp.ba_global_for_kf = loop_kf
        wmap.info_map_change()


@functools.partial(jax.jit, static_argnames=("slot_k",))
def _conformal_scan(states, points, prob, Rcb, tcb, cam, opts, sigmas,
                    slot_k: int = 0):
    """chi2 along the exact conformal (global-scale) curve: scale t, v and
    landmarks about the origin keyframe's position by each sigma. One
    device program evaluates the whole grid; lax.map (not vmap) keeps the
    compiled program ONE chi2 graph + a loop — the vmapped form compiled
    a 13x-wide graph per shape bucket, ~20 s of XLA:CPU compile each
    across the test fixtures."""
    from .ba_core import _chi2_only

    c = states.t[0]

    def chi_at(s):
        st = states._replace(t=c + (states.t - c) * s, v=states.v * s)
        pts = c + (points - c) * s
        return _chi2_only(st, pts, prob, cam, Rcb, tcb, opts, slot_k=slot_k)

    return jax.lax.map(chi_at, sigmas)


def _conformal_best_scale(st, pts, prob, rig, opts, slot_k) -> float:
    """Global-scale line search against the FULL objective (r4): the Schur
    fold's coline diagonal makes the reduced system look ~1e4x stiffer
    along the vision-invariant conformal mode than it is, so the GN
    iteration cannot anneal a wrong monocular metric scale (measured:
    -0.2% scale recovery in 100 exact-solve iterations on a 2.5x
    mis-scaled inertial map whose chi2(scale) sweep showed a clean 25%
    descent at the true scale). The mode is ONE-dimensional and chi2
    along it is smooth, so three bracketed grid passes (one lax.map-scanned
    device dispatch each — see _conformal_scan) recover the optimum
    directly; reprojection is
    exactly invariant, the inertial terms pin the metric. The reference
    needs no equivalent: g2o solves the joint un-marginalized sparse
    system (setMarginalized(false), OptimizerGBA.cpp:92), which has no
    fold to poison. Returns the optimal sigma (1.0 = no improvement)."""
    cam = rig.cam
    Rcb = jnp.asarray(rig.Rcb)
    tcb = jnp.asarray(rig.tcb)

    def scan(sigmas):
        chis = np.asarray(_conformal_scan(
            st, pts, prob, Rcb, tcb, cam, opts,
            jnp.asarray(sigmas, jnp.float32), slot_k=slot_k))
        # extreme sigmas can overflow chi2 to inf/NaN in f32; np.argmin
        # returns the FIRST NaN index, which would steer the search into
        # garbage — treat non-finite as +inf
        return np.where(np.isfinite(chis), chis, np.inf)

    # all grids share ONE length so every pass reuses one compiled program
    # per shape bucket (a distinct sigma count would fork a fresh ~10 s
    # XLA:CPU compile in the test suite)
    G = 13
    sig1 = np.exp(np.linspace(np.log(0.25), np.log(4.0), G))
    chis = scan(sig1)
    k = int(np.argmin(chis))
    lo, hi = sig1[max(k - 1, 0)], sig1[min(k + 1, len(sig1) - 1)]
    sig2 = np.exp(np.linspace(np.log(lo), np.log(hi), G))
    chis2 = scan(sig2)
    k2 = int(np.argmin(chis2))
    lo2 = sig2[max(k2 - 1, 0)]
    hi2 = sig2[min(k2 + 1, len(sig2) - 1)]
    sig3 = np.concatenate([[1.0], np.exp(np.linspace(
        np.log(lo2), np.log(hi2), G - 1))])
    chis3 = scan(sig3)
    base = float(chis3[0])
    k3 = int(np.argmin(chis3))
    s = float(sig3[k3])
    if float(chis3[k3]) >= base * (1.0 - 1e-4) or abs(s - 1.0) < 1e-3:
        return 1.0
    return s


def _apply_conformal(st, pts, s):
    """Scale states/landmarks about the origin KF's position."""
    c = np.asarray(st.t)[0]
    st = st._replace(t=jnp.asarray(c + (np.asarray(st.t) - c) * s),
                     v=jnp.asarray(np.asarray(st.v) * s))
    return st, jnp.asarray(c + (np.asarray(pts) - c) * s)


def _gather_full_problem(wmap: Map):
    """Gather the live map's FIBA residual set (no solve): returns
    (states, points, prob, slot_k, kfs, mps) with states/points padded to
    the solver buckets, or None when the map is too small."""
    rig = wmap.rig
    kfs = sorted(wmap.all_keyframes(), key=lambda k: k.mnId)
    mps = wmap.all_map_points()
    if len(kfs) < 3 or not mps:
        return None
    kf_index = {k.mnId: i for i, k in enumerate(kfs)}
    mp_index = {mp.mnId: j for j, mp in enumerate(mps)}
    states = _body_states(kfs, rig)
    points = np.stack([mp.pos for mp in mps]).astype(np.float32)
    r_kf, r_mp, r_uv, _ = _gather_reproj(kfs, kf_index, mps, mp_index)
    c_idx, c_w, _ = _gather_colines(wmap, mp_index)
    links = _gather_links(kfs, kf_index)
    prob, slot_k, _ = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w,
                                   links=links, n_mp=len(mps))
    n, m = len(kfs), len(mps)
    N, M = _bucket_nm(n, m)
    if N != n:
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (N - n, 3, 3))
        z = np.zeros((N - n, 3), np.float32)
        states = KFStates(
            np.concatenate([states.R, eye]), np.concatenate([states.t, z]),
            np.concatenate([states.v, z]), np.concatenate([states.bg, z]),
            np.concatenate([states.ba, z]))
    if M != m:
        points = np.concatenate(
            [points, np.tile(np.float32([0.0, 0.0, 1.0]), (M - m, 1))])
    return states, points, prob, slot_k, kfs, mps


def whole_map_transform_gain(wmap: Map, Rgw: np.ndarray,
                             scale: float):
    """Evaluate the FULL visual-inertial chi2 of the current map and of a
    candidate whole-map transform (Rgw rotation + rescale, the
    ApplyScaledRotation semantics: R' = Rgw R, t' = s Rgw t, v' = s Rgw v,
    X' = s Rgw X) WITHOUT mutating the map. Lets callers reject a
    closed-form gravity/scale estimate that would worsen the total
    objective — the r4 live corridor showed the velocities-fixed
    ScaleRefinement estimator applying a rotation+scale that exploded the
    whitened inertial chi2 from 2.6e4 to 2.1e8 (and a wrong ROTATION is
    unrepairable by any scale-only search). Returns (chi2_now, chi2_cand),
    or None when the map is too small to evaluate — callers must handle
    None explicitly (the reference applies unconditionally there)."""
    g = _gather_full_problem(wmap)
    if g is None:
        return None
    states, points, prob, slot_k, _, _ = g
    rig = wmap.rig
    opts = BAOptions(reproj_kernel="huber")
    Rcb = jnp.asarray(rig.Rcb)
    tcb = jnp.asarray(rig.tcb)
    one = jnp.ones((1,), jnp.float32)
    st0 = KFStates(*[jnp.asarray(x) for x in states])
    c0 = float(_conformal_scan(st0, jnp.asarray(points), prob, Rcb, tcb,
                               rig.cam, opts, one, slot_k=slot_k)[0])
    Rgw = np.asarray(Rgw, np.float32)
    s = np.float32(scale)
    st1 = KFStates(
        np.einsum("ij,njk->nik", Rgw, states.R),
        s * states.t @ Rgw.T, s * states.v @ Rgw.T,
        states.bg, states.ba)
    pts1 = s * points @ Rgw.T
    c1 = float(_conformal_scan(KFStates(*[jnp.asarray(x) for x in st1]),
                               jnp.asarray(pts1), prob, Rcb, tcb, rig.cam,
                               opts, one, slot_k=slot_k)[0])
    if not (np.isfinite(c0) and np.isfinite(c1)):
        return 0.0, float("inf")
    return c0, c1


def conformal_scale_refine(wmap: Map, lo: float = 0.4,
                           hi: float = 2.5) -> float:
    """Full-objective global-scale correction for a live inertial map: the
    closed-form ScaleRefinement estimator (velocities held fixed,
    OptimizerInertial.cpp:29-152) is attenuation-biased when per-link
    curvature signal is near the visual noise floor and measurably dragged
    live corridor runs toward scale collapse (r4). This gathers the full
    visual-inertial residual set (the FIBA problem, no GN solve) and
    line-searches the one-dimensional conformal mode against the TOTAL
    chi2 — a strictly better estimator of the same quantity, 3
    lax.map-scanned device dispatches. Applies the correction via ApplyScaledRotation and
    returns it (1.0 = map already scale-stationary)."""
    g = _gather_full_problem(wmap)
    if g is None:
        return 1.0
    states, points, prob, slot_k, _, _ = g
    rig = wmap.rig
    opts = BAOptions(reproj_kernel="huber")
    st = KFStates(*[jnp.asarray(x) for x in states])
    s = _conformal_best_scale(st, jnp.asarray(points), prob, rig, opts,
                              slot_k)
    # apply only MEANINGFUL corrections: sub-percent rescalings are within
    # the estimator's own noise and repeatedly churning the whole map by
    # them measurably destabilized downstream place recognition
    if abs(s - 1.0) <= 0.01:
        return 1.0
    # ... and only BOUNDED ones (r5): a live loop-corridor run captured
    # this path applying 0.25x while tracking was coasting lost — at that
    # point the objective itself is contaminated (attenuation bias + stale
    # map) and a >2x "correction" is evidence of estimator degeneracy,
    # not of a 2x metric error. Refuse outside [lo, hi]; repeated in-band
    # anneal steps still reach any genuinely mis-scaled optimum.
    if not (lo <= s <= hi):
        return 1.0
    wmap.apply_scaled_rotation(np.eye(3, dtype=np.float32), s,
                               scale_vel=True)
    wmap.info_map_change()
    return s


def full_inertial_ba(wmap: Map, iters: int = 100, loop_kf: int = 0,
                     b_init: bool = False, prior_g: float = 1e2,
                     prior_a: float = 1e6, abort_check=None,
                     map_lock=None, mesh=None,
                     conformal_shrink_cum: float = 1.0) -> None:
    """Visual-inertial global BA (OptimizerGBA.cpp:291-683). map_lock guards
    the host gather/write phases for background-thread GBA (see
    global_bundle_adjustment); mesh shards the residual set over a device
    mesh (parallel/sharded_ba.py).

    conformal_shrink_cum: cumulative DOWNWARD clamp for the conformal
    annealing loop (growth is always free). Default 1.0 = shrink-free:
    on an already-metric map the attenuation-biased objective proposes
    spurious shrinks (a refused VIBA1's internal FIBA was measured eating
    exactly its clamp, x0.6, on every call). Only the FIRST IMU init —
    whose closed-form seed may genuinely overshoot — passes 0.6."""
    from contextlib import nullcontext

    guard = map_lock if map_lock is not None else nullcontext()
    rig = wmap.rig
    with guard:
        kfs = sorted(wmap.all_keyframes(), key=lambda k: k.mnId)
        mps = wmap.all_map_points()
        if len(kfs) < 2 or not mps:
            return
        kf_index = {k.mnId: i for i, k in enumerate(kfs)}
        mp_index = {mp.mnId: j for j, mp in enumerate(mps)}
        states = _body_states(kfs, rig)
        points = np.stack([mp.pos for mp in mps]).astype(np.float32)
        r_kf, r_mp, r_uv, refs = _gather_reproj(kfs, kf_index, mps, mp_index)
        c_idx, c_w, _ = _gather_colines(wmap, mp_index)
        links = _gather_links(kfs, kf_index)
        if links is not None and b_init:
            # single shared bias: make the random-walk links rigid
            links[14] = np.broadcast_to(np.eye(3, dtype=np.float32) * 1e4,
                                        links[14].shape).copy()
            links[15] = np.broadcast_to(np.eye(3, dtype=np.float32) * 1e4,
                                        links[15].shape).copy()
        # bias priors on the LAST keyframe (OptimizerGBA.cpp:466-472)
        bias_priors = ([kf_index[kfs[-1].mnId]], [prior_g], [prior_a])
        prob, slot_k, _ = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w,
                                       links=links, bias_priors=bias_priors,
                                       n_mp=len(mps))

    kf_dof = np.zeros((len(kfs), 15), bool)
    kf_dof[:, :] = True
    kf_dof[0, :6] = False  # origin pose fixed; velocity/bias free
    # At IMU-init scale (<= 64 KFs) run the reference's full budget with the
    # EXACT reduced-system solve (OptimizerGBA.cpp:291 runs 100 LM its on
    # g2o's sparse Cholesky): this solve must anneal a biased closed-form
    # init scale through the map's soft global-scale mode, which an
    # iteration-capped PCG resolves last; tol-based early exit keeps the
    # common case cheap. Past 64 KFs (loop-closure GBA on a near-metric
    # map) the capped-iteration PCG path is the measured perf choice.
    small = len(kfs) <= 64
    opts = BAOptions(iters=iters if small else min(iters, 25), lambda0=1e-5,
                     reproj_kernel="huber",
                     pose_cg_iters=0 if small else None)
    st, pts, info = _padded_solve(states, points, prob, kf_dof,
                                  np.ones(len(mps), bool), rig, opts,
                                  abort_check=abort_check, mesh=mesh,
                                  slot_k=slot_k)
    # conformal-scale annealing: line-search the global-scale mode the
    # damped-GN fold cannot move, then let the solver re-polish — repeat
    # until the scale is stationary (see _conformal_refine)
    cum = 1.0
    for _ in range(3):
        s = _conformal_best_scale(st, pts, prob, rig, opts, slot_k)
        if s == 1.0:
            break
        # Asymmetric trust bound (r5): near the visual noise floor the
        # attenuation bias only ever pulls the conformal mode DOWN — a
        # live VIBA1 pass was measured annealing a 0.85-of-metric map by
        # x0.34 in one 3-step loop (each step "improving" the
        # contaminated objective), which is the collapse this loop exists
        # to repair, not to cause. Genuine repairs in every captured case
        # pull UP (un-collapsing a biased init). Shrink steps are
        # therefore clamped (>= 0.75 per step, cumulative >=
        # conformal_shrink_cum per call — callers outside the first IMU
        # init get shrink-free annealing); growth steps stay free.
        if s < 1.0:
            s = max(s, 0.75, conformal_shrink_cum / cum)
            if s >= 0.999:
                break
        cum *= s
        st, pts = _apply_conformal(st, pts, s)
        st_n = KFStates(*[np.asarray(x)[:len(kfs)] for x in st])
        pts_n = np.asarray(pts)[:len(mps)]
        st, pts, info = _padded_solve(st_n, pts_n, prob, kf_dof,
                                      np.ones(len(mps), bool), rig, opts,
                                      abort_check=abort_check, mesh=mesh,
                                      slot_k=slot_k)

    st, pts = jax.device_get((st, pts))  # one pipelined fetch
    pts_np = np.asarray(pts)
    with guard:
        if loop_kf == 0:
            _write_back_poses(kfs, st, rig, np.ones(len(kfs), bool),
                              velocities=True)
            for j, mp in enumerate(mps):
                mp.pos = pts_np[j].copy()
                mp.update_normal_and_depth()
            _coline_edge_cleanup(wmap, mps)
        else:
            R = np.asarray(st.R)
            t = np.asarray(st.t)
            v = np.asarray(st.v)
            bg = np.asarray(st.bg)
            ba = np.asarray(st.ba)
            for i, kf in enumerate(kfs):
                Rbw = R[i].T
                tbw = -Rbw @ t[i]
                kf.gba_Rcw = rig.Rcb @ Rbw
                kf.gba_tcw = rig.Rcb @ tbw + rig.tcb
                kf.gba_vel = v[i].copy()
                kf.gba_bias = np.concatenate([bg[i], ba[i]]).astype(
                    np.float32)
                kf.ba_global_for_kf = loop_kf
            for j, mp in enumerate(mps):
                mp.gba_pos = pts_np[j].copy()
                mp.ba_global_for_kf = loop_kf
        wmap.info_map_change()
