"""Asynchrony semantics tests (reference stop/abort protocol):

  * abort_ba consumption — a KF insertion interrupts a running local BA
    (reference mbAbortBA set in InsertKeyFrame LocalMapping.cpp:118-124,
    polled inside g2o OptimizerLBA.cpp:112-113);
  * chunked solve equivalence — uninterrupted chunked GN == one-shot GN;
  * background GBA — runs on a thread, is killed by stop_gba (CorrectLoop
    :810-834), propagates on completion including keyframes created while
    it ran (RunGlobalBundleAdjustment :1189-1289).
"""

import time

import numpy as np
import pytest

from synthetic_world import CAM, SyntheticScene

from ppg_slam_tpu.estimator.ba import (_padded_solve, global_bundle_adjustment,
                                       local_bundle_adjustment)
from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
from ppg_slam_tpu.pipeline.loop_closing import LoopClosing
from ppg_slam_tpu.worldmap import KeyFrame, Map, Rig
from ppg_slam_tpu.worldmap.frame import Frame


def build_small_map(n_kfs=6, seed=5, noise_pt=0.02):
    """A small consistent map with noisy points for BA to polish."""
    from ppg_slam_tpu.worldmap import MapPoint

    rng = np.random.RandomState(seed)
    scene = SyntheticScene(seed=seed)
    rig = Rig(CAM, freq=200.0)
    wmap = Map(rig)
    kfs = []
    id_to_mp = {}
    prev = None
    for k in range(n_kfs):
        Rcw, tcw = scene.pose(k * 4)
        feats, ids = scene.render(Rcw, tcw)
        f = Frame(feats, timestamp=0.2 * k, rig=rig)
        f.set_pose(Rcw, tcw)
        kf = KeyFrame(f, wmap)
        kf.prev_kf = prev
        if prev is not None:
            prev.next_kf = kf
        prev = kf
        kfs.append(kf)
        for i, g in enumerate(ids):
            mp = id_to_mp.get(g)
            if mp is None:
                mp = MapPoint(scene.points[g], kf)
                mp.descriptor = scene.descs[g].copy()
                id_to_mp[g] = mp
                wmap.add_map_point(mp)
            mp.add_observation(kf, i)
            kf.add_map_point(mp, i)
        wmap.add_keyframe(kf)
    for kf in kfs:
        kf.update_connections()
    for mp in id_to_mp.values():
        mp.update_normal_and_depth()
        mp.pos = mp.pos + rng.randn(3).astype(np.float32) * noise_pt
    wmap.kf_origin = kfs[0]
    return wmap, kfs, scene


class TestAbortBA:
    def test_insert_mid_ba_aborts(self):
        wmap, kfs, _ = build_small_map()
        lm = LocalMapping(wmap)
        kf = kfs[-1]

        # simulate a concurrent KF arrival mid-BA: we are inside
        # process_keyframe (the BA), and a tracking thread inserts a KF —
        # that queues it, sets abort_ba, and the BA's next chunk poll stops
        inserted = []
        lm._processing = True  # as set by the enclosing process_all()

        def insert_mid_ba():
            if not inserted:
                inserted.append(True)
                lm.insert_keyframe(kfs[-2])
            return lm._abort_requested()

        lm.abort_ba = False
        local_bundle_adjustment(kf, wmap, iters=10,
                                abort_check=insert_mid_ba)
        assert inserted, "abort poll ran"
        assert lm.n_ba_aborted >= 1, "BA must have been aborted"
        assert lm.queue, "inserted KF awaits the outer drain loop"
        lm._processing = False

    def test_kf_gate_backlog_policy(self):
        """need_new_keyframe with a THREADED mapper: keyframe acceptance
        must NOT sample the worker's instantaneous busyness (that made the
        KF set a function of link/thread timing — the r4 driver/judge
        nondeterminism — and starved the map on slow links). The consumer
        accepts up to a depth-8 backlog (the backlog pre-emption in
        process_keyframe keeps the drain at host fuse speed), and
        RECENTLY_LOST bypasses the cap entirely (mapping fresh territory
        beats BA freshness)."""
        from ppg_slam_tpu.pipeline.tracking import (OK, RECENTLY_LOST,
                                                    Tracking)

        wmap, kfs, _ = build_small_map()
        lm = LocalMapping(wmap)
        tracking = Tracking.__new__(Tracking)  # state-only: no extractor
        tracking.state_events = []  # state setter records transitions
        tracking.map = wmap
        tracking.local_mapper = lm
        tracking.last_kf = kfs[-1]
        tracking.matches_inliers = 50
        tracking.state = OK

        class _F:
            timestamp = kfs[-1].timestamp + 0.5

        tracking.current = _F()

        # synchronous mapper (no thread), busy => skip (unchanged policy)
        lm._idle = False
        assert not tracking.need_new_keyframe()
        # threaded worker mid-keyframe, shallow queue => allow
        lm._thread = object()
        assert tracking.need_new_keyframe()
        lm.queue.append(kfs[-2])
        assert tracking.need_new_keyframe()
        # depth-8 safety valve binds
        lm.queue.extend([kfs[-2]] * 7)
        assert not tracking.need_new_keyframe()
        # ... except when coasting into unmapped territory (inertial
        # RECENTLY_LOST): the cap is bypassed
        wmap.imu_initialized = True
        tracking.state = RECENTLY_LOST
        assert tracking.need_new_keyframe()
        wmap.imu_initialized = False
        lm.queue.clear()
        lm._thread = None
        lm._idle = True

    def test_chunked_equals_oneshot(self):
        """Chunked (interruptible) GN with no abort == one-shot GN."""
        import jax.numpy as jnp

        from ppg_slam_tpu.estimator.ba import (_body_states, _gather_reproj,
                                               _gather_colines, _pad_problem)
        from ppg_slam_tpu.estimator.ba_core import BAOptions

        wmap, kfs, _ = build_small_map(seed=11)
        rig = wmap.rig
        mps = wmap.all_map_points()
        kf_index = {k.mnId: i for i, k in enumerate(kfs)}
        mp_index = {mp.mnId: j for j, mp in enumerate(mps)}
        states = _body_states(kfs, rig)
        points = jnp.asarray(np.stack([mp.pos for mp in mps]))
        r_kf, r_mp, r_uv, _ = _gather_reproj(kfs, kf_index, mps, mp_index)
        c_idx, c_w, _ = _gather_colines(wmap, mp_index)
        prob, _, _ = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w)
        kf_dof = np.zeros((len(kfs), 15), bool)
        kf_dof[1:, :6] = True
        mp_free = np.ones(len(mps), bool)
        # tol=0 pins fixed-iteration semantics: the convergence early-exit
        # (small-gain termination) applies at different granularity in the
        # two paths, so exact equivalence is only defined without it
        opts = BAOptions(iters=8, lambda0=100.0, reproj_kernel="cauchy",
                         tol=0.0)

        st1, pts1, _ = _padded_solve(states, points, prob, kf_dof.copy(),
                                     mp_free.copy(), rig, opts)
        st2, pts2, info2 = _padded_solve(states, points, prob, kf_dof.copy(),
                                         mp_free.copy(), rig, opts,
                                         abort_check=lambda: False, chunk=2)
        assert info2["iters_run"] == 8
        np.testing.assert_allclose(np.asarray(pts1), np.asarray(pts2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st1.t), np.asarray(st2.t),
                                   atol=1e-5)

    def test_abort_skips_iterations(self):
        wmap, kfs, _ = build_small_map(seed=13)
        calls = []

        def abort_after_first():
            calls.append(1)
            return len(calls) >= 1

        local_bundle_adjustment(kfs[-1], wmap, iters=10,
                                abort_check=abort_after_first)
        # poll happened at most a few times: the solve stopped early
        assert 1 <= len(calls) <= 2


class TestThreadedLocalMapping:
    """The consumer-thread deployment (reference MSLocalMapping::Run thread,
    System.cpp:106-116): fine-grained map locking (fuse/apply locked, device
    solve unlocked) and the transform-epoch stale-write-back guard."""

    def test_stale_writeback_dropped_on_transform_epoch(self):
        """A whole-map transform landing mid-solve (IMU init / loop
        correction / reset) must invalidate the BA's write-back — the
        effect of the reference's RequestStop around InitializeIMU
        (Tracking.cpp:1509)."""
        wmap, kfs, _ = build_small_map(seed=31)
        poses = [k.tcw.copy() for k in kfs]
        mps = wmap.all_map_points()
        pts = [mp.pos.copy() for mp in mps]
        bumped = []

        def bump_once():  # polled between GN chunks, i.e. mid-solve
            if not bumped:
                bumped.append(1)
                wmap.bump_transform_epoch()
            return False  # not an abort: the solve itself runs to the end

        local_bundle_adjustment(kfs[-1], wmap, iters=8,
                                abort_check=bump_once,
                                map_lock=wmap.update_lock)
        assert bumped
        for k, p in zip(kfs, poses):
            np.testing.assert_array_equal(k.tcw, p)
        for mp, p in zip(mps, pts):
            np.testing.assert_array_equal(mp.pos, p)

    def test_current_epoch_writeback_applies(self):
        """Same solve with no mid-solve transform: the write-back lands."""
        wmap, kfs, _ = build_small_map(seed=32)
        pts = [mp.pos.copy() for mp in wmap.all_map_points()]
        local_bundle_adjustment(kfs[-1], wmap, iters=8,
                                map_lock=wmap.update_lock)
        moved = sum(
            float(np.linalg.norm(mp.pos - p)) > 1e-7
            for mp, p in zip(wmap.all_map_points(), pts))
        assert moved > len(pts) // 2, "BA write-back must have applied"

    def test_worker_thread_processes_and_stops_clean(self):
        wmap, kfs, _ = build_small_map(seed=33)
        lm = LocalMapping(wmap)
        lm.start()
        try:
            chg0 = wmap.change_idx
            lm.insert_keyframe(kfs[-1])
            assert lm.wait_idle(timeout=60.0)
            assert wmap.change_idx > chg0, "worker ran fuse + BA"
        finally:
            lm.stop()
        assert lm.worker_error is None

    def test_reset_generation_drops_orphan_keyframes(self):
        """Keyframes enqueued before a reset must not be processed into the
        post-reset map (the reference RequestReset drains synchronously,
        LocalMapping.cpp:433-464)."""
        wmap, kfs, _ = build_small_map(seed=34)
        lm = LocalMapping(wmap)
        # not started: queue manually, then reset, then start the worker
        lm.queue.append(kfs[-1])
        lm.reset()
        assert not lm.queue
        lm._gen >= 1
        chg0 = wmap.change_idx
        lm.start()
        try:
            assert lm.wait_idle(timeout=30.0)
            assert wmap.change_idx == chg0, "orphan KF must not be processed"
        finally:
            lm.stop()

    # NOTE: the full threaded-deployment e2e lives in test_pipeline_e2e —
    # its module fixture runs the 100-frame sequence WITH the consumer
    # thread (measured identical to the synchronous path to 5 decimals of
    # ATE), so the deployment is exercised at zero extra suite cost.


class TestBackgroundGBA:
    def test_threaded_gba_completes_and_propagates(self):
        wmap, kfs, _ = build_small_map(seed=21)
        lc = LoopClosing(wmap, active=False)
        lc.threaded_gba = True

        # perturb one KF so GBA has something to fix
        true_pose = (kfs[2].Rcw.copy(), kfs[2].tcw.copy())
        kfs[2].set_pose(kfs[2].Rcw,
                        kfs[2].tcw + np.float32([0.05, 0.0, 0.0]))

        lc.start_gba_thread(loop_kf_id=kfs[-1].mnId)
        applied = lc.poll_gba(wait=True)
        assert applied, "background GBA must finish and apply"
        assert not lc.gba_running
        err = np.linalg.norm(kfs[2].tcw - true_pose[1])
        assert err < 0.04, f"GBA did not reduce the perturbation: {err}"

    def test_threaded_gba_killed_by_stop(self):
        wmap, kfs, _ = build_small_map(seed=22)
        lc = LoopClosing(wmap, active=False)
        lc.threaded_gba = True
        poses_before = [k.tcw.copy() for k in kfs]

        lc.start_gba_thread(loop_kf_id=kfs[-1].mnId)
        lc.stop_gba = True  # what a newer CorrectLoop does
        lc._gba_thread.join()
        applied = lc.poll_gba(wait=True)
        assert not applied, "stopped GBA must discard results"
        # poses untouched (scratch never applied)
        for k, p in zip(kfs, poses_before):
            np.testing.assert_array_equal(k.tcw, p)

    def test_mid_gba_keyframe_chain_corrected(self):
        """A KF added after GBA started gets corrected through its temporal
        predecessor (reference spanning-tree propagation :1189-1230)."""
        wmap, kfs, scene = build_small_map(seed=23)
        lc = LoopClosing(wmap, active=False)

        # run the solve synchronously (stamps scratch on current KFs)...
        lc._solve_gba(loop_kf_id=kfs[-1].mnId, abort_check=None)

        # ...then add a new KF chained to the last one, with a known
        # relative pose, BEFORE applying
        Rcw, tcw = scene.pose(len(kfs) * 4)
        feats, ids = scene.render(Rcw, tcw)
        frame = Frame(feats, 0.2 * len(kfs), wmap.rig)
        frame.set_pose(Rcw, tcw)
        new_kf = KeyFrame(frame, wmap)
        new_kf.prev_kf = kfs[-1]
        kfs[-1].next_kf = new_kf
        wmap.add_keyframe(new_kf)
        R_rel = new_kf.Rcw @ kfs[-1].Rcw.T
        t_rel = new_kf.tcw - R_rel @ kfs[-1].tcw

        lc._apply_gba(loop_kf_id=kfs[-1].mnId)

        # relative pose to the predecessor must be preserved
        R_rel2 = new_kf.Rcw @ kfs[-1].Rcw.T
        t_rel2 = new_kf.tcw - R_rel2 @ kfs[-1].tcw
        np.testing.assert_allclose(R_rel2, R_rel, atol=1e-5)
        np.testing.assert_allclose(t_rel2, t_rel, atol=1e-4)
