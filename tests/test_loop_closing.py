"""Loop-closing end-to-end: a full Tracking+LocalMapping+LoopClosing run on
a closed circular trajectory (tests/synthetic_sequence.make_loop_sequence).

Yaw is unobservable monocular-inertially, so it drifts around the circle;
opposite arcs share no landmarks, so the drift cannot be absorbed by
re-matching — the revisit keyframes are not covisible with the start and the
whole detection -> Sim3 -> rotation gate -> CorrectLoop -> essential graph
chain (pipeline/loop_closing.py, reference LoopClosing.cpp:192-1057) must
run to close it.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VOC_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "voc_euroc_9x3.npz")


def _ate(kf_list, seq):
    """RMSE of KF camera centers vs ground truth after Sim3 (Umeyama)
    alignment."""
    from ppg_slam_tpu.utils.evaluation import ate_rmse

    est, gt = [], []
    for kf in kf_list:
        if kf.is_bad():
            continue
        est.append(kf.camera_center())
        gt.append(seq.frame_poses[kf.frame_id][1])
    return ate_rmse(np.stack(est), np.stack(gt), with_scale=True)


@pytest.fixture(scope="module")
def loop_run():
    if not os.path.exists(VOC_PATH):
        pytest.skip("reference vocabulary not available")
    from synthetic_sequence import SyntheticExtractor, make_loop_sequence
    from ppg_slam_tpu.bow import Vocabulary
    from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
    from ppg_slam_tpu.pipeline.loop_closing import LoopClosing
    from ppg_slam_tpu.pipeline.tracking import Tracking
    from ppg_slam_tpu.worldmap import Map, Rig

    # 168 frames: the circle still accumulates enough yaw drift for a real
    # loop closure (verified: 1 loop fires, ATE 0.07 -> 0.012) at ~60% of
    # the 240-frame build cost on the 1-core CI host
    seq = make_loop_sequence(n_frames=168)
    rig = Rig(seq.scene.cam, freq=200.0)
    voc = Vocabulary.load(VOC_PATH)
    wmap = Map(rig, vocabulary=voc)
    Map.imu_ini_time = 2.0
    tracking = Tracking(wmap, SyntheticExtractor(seq))
    lc = LoopClosing(wmap, active=True)
    lm = LocalMapping(wmap, tracking=tracking, loop_closer=lc)
    tracking.local_mapper = lm
    lc.local_mapper = lm

    pre_loop_ate = {}
    orig_correct = lc.correct_loop

    def hooked():
        pre_loop_ate["ate"] = _ate(list(wmap.keyframes), seq)
        pre_loop_ate["kf_id"] = lc.current_kf.mnId
        orig_correct()

    lc.correct_loop = hooked

    last_t = -1.0
    for i in range(seq.n_frames):
        t = seq.frame_times[i]
        tracking.grab_imu(seq.imu_between(last_t, t))
        last_t = t
        tracking.grab_image(np.zeros((2, 2), np.uint8), t)
    return seq, wmap, tracking, lc, pre_loop_ate


class TestLoopClosing:
    def test_tracks_the_full_circle(self, loop_run):
        seq, wmap, tracking, lc, pre = loop_run
        assert tracking.state == 1, "must be tracking at the end"
        assert wmap.n_keyframes() >= 30
        assert wmap.imu_initialized and wmap.inertial_ba1

    def test_loop_detected_and_closed(self, loop_run):
        seq, wmap, tracking, lc, pre = loop_run
        assert lc.n_loops_closed >= 1, "no loop was closed"
        # the loop fired on a late (revisit) keyframe, not early
        assert pre["kf_id"] > wmap.max_kf_id * 0.6

    def test_yaw_only_correction_post_imu(self, loop_run):
        """Post-IMU-init corrections must preserve gravity: the corrected
        keyframes' roll/pitch stay near truth (the yaw-only gate,
        LoopClosing.cpp:94-135)."""
        seq, wmap, tracking, lc, pre = loop_run
        errs = []
        for kf in wmap.keyframes:
            if kf.is_bad():
                continue
            Rgt = seq.frame_poses[kf.frame_id][0]  # Rwb == Rwc here
            Rd = kf.Rcw @ Rgt  # identity up to yaw drift if gravity held
            # gravity direction error: angle between world-y axes
            cos_up = np.clip(Rd[1, 1], -1.0, 1.0)
            errs.append(np.degrees(np.arccos(cos_up)))
        assert np.median(errs) < 2.0, f"roll/pitch corrupted: {np.median(errs)}"

    # Golden-trajectory pin for the loop sequence (same policy as
    # tests/test_pipeline_e2e.py::PINNED_ATE_M): deterministic fixture,
    # 2x band, re-pin deliberately on intended changes.
    PINNED_POST_LOOP_ATE_M = 0.012

    def test_ate_improves_after_loop(self, loop_run):
        seq, wmap, tracking, lc, pre = loop_run
        post = _ate(list(wmap.keyframes), seq)
        assert "ate" in pre, "correct_loop never ran"
        assert post < pre["ate"], (pre["ate"], post)
        assert post < 2.0 * self.PINNED_POST_LOOP_ATE_M, (
            f"post-loop ATE regressed: {post:.4f} m vs pinned "
            f"{self.PINNED_POST_LOOP_ATE_M} m")
