"""Relocalization: kill vision mid-sequence for longer than the IMU coast
window (5 s), then restore it — tracking must recover via the BoW->PnP->
pose-opt relocalization pipeline (Tracking.cpp:1179-1345) WITHOUT a map
reset. The reference ships Relocalization but never invokes it (LOST ->
reset, SURVEY §5); the rebuild wires it into the RECENTLY_LOST/LOST paths.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VOC_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "voc_euroc_9x3.npz")
BLIND_START, BLIND_END = 62, 167  # no features for 5.25 s: outlasts the
# IMU coast window (5 s), forcing LOST -> relocalization. 62 pre-blind
# frames = IMU init (t=2 s -> frame 40) + 1.1 s of inertially-initialized
# tracking, comfortably past the >10-KF reloc gate; 28 post-blind frames
# cover reloc + restored-OK tail (reloc fires on the first sighted frame).


class BlindableExtractor:
    def __init__(self, seq):
        from synthetic_sequence import SyntheticExtractor

        self.inner = SyntheticExtractor(seq)

    def extract(self, image):
        feats = self.inner.extract(image)
        i = self.inner.frame_idx - 1
        if BLIND_START <= i < BLIND_END:
            from ppg_slam_tpu.frontend.extractor import FrameFeatures

            return FrameFeatures(
                kp_pos=np.zeros((0, 2), np.float32),
                kp_pos_un=np.zeros((0, 2), np.float32),
                kp_score=np.zeros(0, np.float32),
                kp_out=np.zeros(0, bool),
                edges=np.zeros((0, 2), np.int32),
                edge_score=np.zeros(0, np.float32),
                colines=np.zeros((0, 3), np.int32),
                connected=[], desc=np.zeros((0, 256), np.float32))
        return feats


@pytest.fixture(scope="module")
def reloc_run():
    if not os.path.exists(VOC_PATH):
        pytest.skip("reference vocabulary not available")
    from synthetic_sequence import SyntheticSequence
    from ppg_slam_tpu.bow import Vocabulary
    from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
    from ppg_slam_tpu.pipeline.tracking import Tracking
    from ppg_slam_tpu.worldmap import Map, Rig

    seq = SyntheticSequence(n_frames=195, noise_px=0.3,
                        imu_noise=(2e-3, 2e-2))
    rig = Rig(seq.scene.cam, freq=200.0)
    wmap = Map(rig, vocabulary=Vocabulary.load(VOC_PATH))
    Map.imu_ini_time = 2.0
    tracking = Tracking(wmap, BlindableExtractor(seq),
                        insert_kfs_lost=False)
    lm = LocalMapping(wmap, tracking=tracking)
    tracking.local_mapper = lm

    states = []
    reloc_at = []
    orig = tracking.relocalization

    def hooked():
        got = orig()
        if got:
            reloc_at.append(tracking.current.mnId)
        return got

    tracking.relocalization = hooked

    last_t = -1.0
    for i in range(seq.n_frames):
        t = seq.frame_times[i]
        tracking.grab_imu(seq.imu_between(last_t, t))
        last_t = t
        tracking.grab_image(np.zeros((2, 2), np.uint8), t)
        states.append(tracking.state)
    return seq, wmap, tracking, states, reloc_at


class TestRelocalization:
    def test_loses_and_recovers_without_reset(self, reloc_run):
        seq, wmap, tracking, states, reloc_at = reloc_run
        from ppg_slam_tpu.pipeline.tracking import OK

        assert tracking.n_resets == 0, "map must NOT be reset"
        # lost during the blind window...
        assert any(s != OK for s in states[BLIND_START + 1:BLIND_END])
        # ...and OK again before the end
        assert states[-1] == OK, states[-25:]
        assert len(reloc_at) >= 1, "relocalization never succeeded"

    def test_recovered_pose_is_map_consistent(self, reloc_run):
        """The recovered pose must agree with the map it relocalized into:
        align the map to ground truth with a Sim3 fitted on the PRE-BLIND
        keyframes, then the post-reloc camera center must match GT under
        that alignment (the map's own global scale error — noisy IMU init —
        is not a relocalization defect)."""
        seq, wmap, tracking, states, reloc_at = reloc_run
        pre = [(kf.camera_center(), seq.frame_poses[kf.frame_id][1])
               for kf in wmap.keyframes
               if not kf.is_bad() and kf.frame_id < BLIND_START]
        E = np.stack([p[0] for p in pre])
        G = np.stack([p[1] for p in pre])
        mu_e, mu_g = E.mean(0), G.mean(0)
        U, D, Vt = np.linalg.svd((G - mu_g).T @ (E - mu_e) / len(E))
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        s = np.trace(np.diag(D) @ S) / (E - mu_e).var(0).sum()
        t = mu_g - s * R @ mu_e

        f = tracking.current
        c = f.camera_center()
        aligned = s * R @ c + t
        gt = seq.frame_poses[f.mnId][1]
        terr = float(np.linalg.norm(aligned - gt))
        assert terr < 0.5, f"post-reloc map-frame error: {terr:.3f} m"

    def test_map_survived(self, reloc_run):
        seq, wmap, tracking, states, reloc_at = reloc_run
        # keyframes from before the blind window still exist
        early = [kf for kf in wmap.keyframes if kf.frame_id < BLIND_START]
        assert len(early) >= 5
