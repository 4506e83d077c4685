"""End-to-end mono-inertial pipeline test on the synthetic sequence.

The dataset-free analog of minimum-slice gate #2 (SURVEY.md §7 phase 5):
initialization, per-frame tracking, keyframe growth, IMU initialization and
metric-scale recovery, trajectory accuracy vs ground truth.
"""

import numpy as np
import pytest

from synthetic_sequence import SyntheticExtractor, SyntheticSequence
from synthetic_world import CAM

from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
from ppg_slam_tpu.pipeline.tracking import OK, Tracking
from ppg_slam_tpu.worldmap import Map, Rig


from ppg_slam_tpu.utils.evaluation import umeyama


def umeyama_align(est: np.ndarray, gt: np.ndarray, with_scale=True):
    """Sim3 alignment (evo-style) returning aligned estimate + scale."""
    s, R, t = umeyama(est, gt, with_scale=with_scale)
    return est @ (s * R).T + t, s


@pytest.fixture(scope="module")
def run_sequence():
    # 90 frames: init lands ~frame 12, leaving ~75 OK frames — above every
    # assertion margin at ~3/4 of the original 120-frame build cost (80
    # frames was tried and left the metric-scale recovery right at the
    # 0.15 tolerance edge: the IMU needs the extra 0.5 s of excitation).
    # Runs in the DEPLOYED threaded-mapper configuration (LocalMapping
    # consumer thread + per-phase map locking), paced with wait_idle so the
    # keyframe schedule is deterministic — measured identical to the
    # synchronous path to 5 decimals of ATE (tests/test_async.py proves the
    # stale-write-back and reset-generation guards separately).
    seq = SyntheticSequence(n_frames=90)
    rig = Rig(CAM, freq=200.0)
    wmap = Map(rig)
    Map.imu_ini_time = 2.0  # speed up VIBA scheduling in the test
    ext = SyntheticExtractor(seq)
    tracking = Tracking(wmap, ext)
    lm = LocalMapping(wmap, tracking=tracking)
    tracking.local_mapper = lm
    lm.start()

    est = {}
    states = []
    last_t = -1.0
    for i in range(seq.n_frames):
        t = seq.frame_times[i]
        imu = seq.imu_between(last_t, t)
        last_t = t
        tracking.grab_imu(imu)
        frame = tracking.grab_image(np.zeros((2, 2), np.uint8), t)
        # deterministic pacing: the synthetic extractor is instantaneous,
        # so an unpaced loop would outrun the mapper and starve the map
        lm.wait_idle(timeout=120.0)
        states.append(tracking.state)
        if tracking.state == OK and frame.has_pose:
            est[i] = frame.camera_center()
    lm.stop()
    # donate the built map to later modules (tests/map_store.py): modules
    # that only need *a* populated tracked map reuse it instead of paying
    # another multi-minute pipeline build on the 1-core CI host
    import map_store

    map_store.put("straight", wmap, seq)
    return seq, tracking, wmap, est, states, lm


class TestPipelineE2E:
    def test_initializes_and_tracks(self, run_sequence):
        seq, tracking, wmap, est, states, lm = run_sequence
        assert states.count(OK) > 55, f"too few OK frames: {states}"
        assert states[-1] == OK, "must be tracking at the end"
        assert wmap.n_keyframes() >= 10
        assert wmap.n_map_points() > 100

    def test_imu_initialized_and_metric_scale(self, run_sequence):
        seq, tracking, wmap, est, states, lm = run_sequence
        assert wmap.imu_initialized, "IMU must initialize"
        # with IMU the map becomes metric: Sim3 alignment scale ~ 1
        ids = sorted(est.keys())[-50:]
        E = np.stack([est[i] for i in ids])
        G = np.stack([
            seq.frame_poses[i][1] for i in ids])  # camera==body center
        _, s = umeyama_align(E, G, with_scale=True)
        assert abs(s - 1.0) < 0.15, f"metric scale off: {s}"

    # Golden-trajectory regression pin: the sequence, seeds and solver are
    # deterministic on the CPU test backend, so the achieved ATE is a
    # committed fixture — optimizer/front-end changes that silently degrade
    # accuracy fail HERE instead of surfacing in a future dataset run.
    # Tolerance 2x covers cross-platform libm/reassociation jitter while
    # still catching any real regression (a broken optimizer moves ATE by
    # an order of magnitude). Re-pin deliberately when an intended change
    # shifts it.
    PINNED_ATE_M = 0.180  # measured 0.1800 (≈3% of the ~6 m trajectory)

    def test_trajectory_ate(self, run_sequence):
        seq, tracking, wmap, est, states, lm = run_sequence
        ids = sorted(est.keys())
        E = np.stack([est[i] for i in ids])
        G = np.stack([seq.frame_poses[i][1] for i in ids])
        aligned, s = umeyama_align(E, G, with_scale=True)
        ate = np.sqrt(np.mean(np.sum((aligned - G) ** 2, 1)))
        traj_len = np.sum(np.linalg.norm(np.diff(G, axis=0), axis=1))
        assert ate < 0.05 * traj_len, (
            f"ATE {ate:.4f} m vs trajectory length {traj_len:.2f} m")
        assert ate < 2.0 * self.PINNED_ATE_M, (
            f"ATE regressed: {ate:.4f} m vs pinned {self.PINNED_ATE_M} m "
            f"(golden-trajectory fixture — see comment above)")

    def test_ppg_graph_populated(self, run_sequence):
        seq, tracking, wmap, est, states, lm = run_sequence
        assert len(wmap.map_edges) > 20, "MapEdges must be created"
        assert len(wmap.map_colines) > 5, "MapColines must be created"

    def test_fiba_recovers_misscaled_map(self, run_sequence):
        """full_inertial_ba must anneal a global metric-scale error — the
        r4 root-cause regression: the Schur fold's coline diagonal (without
        its cross blocks) leaks ~1e4x spurious stiffness into the vision-
        invariant conformal mode (measured 9.5e6 vs a true 450), freezing
        the damped-GN solver's metric-scale recovery entirely (-0.2% of a
        2.5x error in 100 exact-solve iterations). Guards the conformal
        line-search annealing interleaved with the solve
        (ba._conformal_best_scale) plus the raised rejection cap and the
        backtracking step accept in ba_core."""
        import map_store

        from ppg_slam_tpu.estimator.ba import full_inertial_ba

        seq, tracking, wmap, est, states, lm = run_sequence
        wm2 = map_store.get_map("straight")  # fresh copy, mutation-safe
        assert wm2 is not None and wm2.imu_initialized

        def s_align(wm):
            E, G = [], []
            for kf in sorted((k for k in wm.all_keyframes()
                              if not k.is_bad()), key=lambda k: k.mnId):
                i = int(round(kf.timestamp * seq.fps))
                if 0 <= i < seq.n_frames:
                    E.append(kf.camera_center())
                    G.append(seq.frame_poses[i][1])
            s, _, _ = umeyama(np.stack(E), np.stack(G), with_scale=True)
            return s

        # umeyama returns the est->gt alignment scale: halving the map
        # DOUBLES it
        s_good = s_align(wm2)
        wm2.apply_scaled_rotation(np.eye(3, dtype=np.float32), 0.5,
                                  scale_vel=True)
        assert abs(s_align(wm2) / s_good - 2.0) < 0.05
        # 40 iterations: the conformal line search does the scale work;
        # the full reference budget (100) only adds CI wall time here
        full_inertial_ba(wm2, iters=40, loop_kf=0, b_init=False,
                         prior_g=1.0, prior_a=1e5)
        s_after = s_align(wm2)
        # the 2x scale error must be substantially annealed in ONE call
        # (the live pipeline additionally re-runs refinements + VIBA1;
        # FIBA converges toward IMU-metric scale, which may legitimately
        # land PAST s_good toward 1.0)
        assert 0.6 < s_after / s_good < 1.33, (
            f"FIBA left the map at {s_after / s_good:.3f}x its tracked "
            f"scale (started at 2.0x) — the scale mode is frozen again")

    def test_transform_gain_gate_directions(self, run_sequence):
        """Direct coverage of whole_map_transform_gain (VERDICT r4 #9):
        the acceptance gate must (a) score the identity transform as a
        no-op, (b) score catastrophic collapses/rotations as worse, and
        (c) never mutate the map it evaluates."""
        import map_store

        from ppg_slam_tpu.estimator.ba import whole_map_transform_gain
        from ppg_slam_tpu.geometry import so3

        seq, tracking, wmap, est, states, lm = run_sequence
        wm2 = map_store.get_map("straight")
        I = np.eye(3, dtype=np.float32)
        gain = whole_map_transform_gain(wm2, I, 1.0)
        assert gain is not None
        c0, c1 = gain
        assert c0 > 0 and abs(c1 - c0) <= 1e-3 * c0, (c0, c1)
        # 0.3x metric collapse on a healthy metric map must be refused
        c0, c1 = whole_map_transform_gain(wm2, I, 0.3)
        assert c1 > c0 * 1.001, (c0, c1)
        # a grossly wrong gravity rotation (~29 deg) must be refused
        Rbad = so3.exp(np.float32([0.5, 0.0, 0.0])).astype(np.float32)
        r0, r1 = whole_map_transform_gain(wm2, Rbad, 1.0)
        assert r1 > r0 * 1.001, (r0, r1)
        # purity: evaluating candidates must not have mutated the map
        c0b, _ = whole_map_transform_gain(wm2, I, 0.3)
        assert c0b == c0, (c0, c0b)

    def test_conformal_refine_fixes_misscale_only(self, run_sequence):
        """Direct coverage of conformal_scale_refine (VERDICT r4 #9): it
        must substantially repair a deliberately mis-scaled map and no-op
        on a healthy one."""
        import map_store

        from ppg_slam_tpu.estimator.ba import conformal_scale_refine

        seq, tracking, wmap, est, states, lm = run_sequence
        wm2 = map_store.get_map("straight")
        I = np.eye(3, dtype=np.float32)
        s_noop = conformal_scale_refine(wm2)
        assert abs(s_noop - 1.0) < 0.05, s_noop
        # collapse the map 2x and ask for repair: the full-objective line
        # search must push the scale back up by a substantial factor
        wm2.apply_scaled_rotation(I, 0.5, scale_vel=True)
        s_fix = conformal_scale_refine(wm2)
        assert s_fix > 1.3, (
            f"conformal refine returned {s_fix:.3f} on a 0.5x-collapsed "
            f"map — the scale net is blind again")

    def test_scale_trim_band_and_budget(self):
        """The r5 scale-TRIM policy: per-event band [0.7, 1.43] plus a
        cumulative shrink budget (applied product may not fall below
        0.85; growth extends it). The attenuation-biased estimator
        random-walks the scale DOWN through individually-plausible trims
        (captured: 0.888 x 0.901 x 0.968 = x0.77) — the budget is what
        stops the walk."""
        from ppg_slam_tpu.pipeline.tracking import _trim_accepts

        # fresh budget: band applies
        assert _trim_accepts(1.0, 1.0)
        assert _trim_accepts(0.9, 1.0)
        assert _trim_accepts(1.4, 1.0)
        assert not _trim_accepts(0.65, 1.0)
        assert not _trim_accepts(1.5, 1.0)
        # after a 0.9 shrink the remaining budget is 0.85/0.9 = 0.944:
        # another 0.9 trim must be refused even though it is in-band
        assert not _trim_accepts(0.9, 0.9)
        assert _trim_accepts(0.95, 0.9)
        # growth extends the budget
        assert _trim_accepts(0.9, 1.2)
        # growth is never budget-limited
        assert _trim_accepts(1.3, 0.9)

    def test_small_transform_bounds(self):
        """_small_transform gates the unconditional-apply bypass: tiny
        annealing corrections pass, collapses and big rotations do not."""
        from ppg_slam_tpu.geometry import so3
        from ppg_slam_tpu.pipeline.tracking import _small_transform

        I = np.eye(3, dtype=np.float32)
        assert _small_transform(I, 1.03)
        assert _small_transform(I, 0.96)
        assert not _small_transform(I, 0.5)
        assert not _small_transform(I, 1.2)
        assert _small_transform(
            so3.exp(np.float32([0.01, 0, 0])), 1.0)
        assert not _small_transform(
            so3.exp(np.float32([0.05, 0, 0])), 1.0)

    def test_threaded_mapper_ran_clean(self, run_sequence):
        """The fixture deployed the consumer-thread local mapper: it must
        have processed every keyframe without an exception and stopped
        (stop() re-raises any worker error)."""
        seq, tracking, wmap, est, states, lm = run_sequence
        assert lm.worker_error is None
        assert lm._thread is None and lm.idle()
