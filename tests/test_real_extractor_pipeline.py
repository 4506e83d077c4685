"""The REAL front-end feeding the real pipeline (no SyntheticExtractor).

Renders a wireframe scene (line segments with junctions — the structure the
PPG nets were trained for), runs the actual PPGExtractor (CNN forwards, NMS,
line linking, descriptors) per frame, and drives Tracking through monocular
initialization and visual tracking on the extracted features. This closes
the loop the synthetic-extractor tests cannot: net -> decode -> graph ->
Frame -> two-view init -> map -> per-frame association, end to end.

Reference analog: Frame construction runs the extractor inline
(/root/reference/map/src/Frame.cpp:50-78) and MonocularInitialization
matches real descriptors (Tracking.cpp:488-554).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real-CNN pipeline on CPU: opt-in lane

from ppg_slam_tpu.frontend import PPGExtractor
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
from ppg_slam_tpu.pipeline.tracking import Tracking
from ppg_slam_tpu.worldmap import Map, Rig

W, H = 640, 480
CAM = CameraModel(kind=CAM_PINHOLE, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                  dist=(0.0, 0.0, 0.0, 0.0), width=W, height=H)


def _wireframe_scene(seed=7):
    """3-D line segments forming a grid of crossing bars on two walls —
    plenty of junctions (segment crossings) for the PPG junction head."""
    segs = []
    # back wall z=6: vertical + horizontal bars -> grid junctions
    for x in np.linspace(-2.4, 2.4, 9):
        segs.append(((x, -1.8, 6.0), (x, 1.8, 6.0)))
    for y in np.linspace(-1.8, 1.8, 7):
        segs.append(((-2.4, y, 6.0), (2.4, y, 6.0)))
    # slanted foreground bars (depth variation for parallax)
    rng = np.random.RandomState(seed)
    for _ in range(10):
        p = rng.uniform([-2, -1.5, 3.5], [2, 1.5, 5.5])
        q = p + rng.uniform([-1.5, -1.5, -0.4], [1.5, 1.5, 0.4])
        segs.append((tuple(p), tuple(q)))
    return np.asarray(segs, np.float64)  # (S, 2, 3)


def _render(segs, Rcw, tcw, rng):
    import cv2

    img = np.full((H, W), 110, np.uint8)
    for p, q in segs:
        Pc = Rcw @ p + tcw
        Qc = Rcw @ q + tcw
        if Pc[2] < 0.5 or Qc[2] < 0.5:
            continue
        u0 = (CAM.fx * Pc[0] / Pc[2] + CAM.cx, CAM.fy * Pc[1] / Pc[2] + CAM.cy)
        u1 = (CAM.fx * Qc[0] / Qc[2] + CAM.cx, CAM.fy * Qc[1] / Qc[2] + CAM.cy)
        cv2.line(img, (int(round(u0[0])), int(round(u0[1]))),
                 (int(round(u1[0])), int(round(u1[1]))), 230, 2,
                 lineType=cv2.LINE_AA)
    noise = rng.randint(-8, 8, img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def real_run():
    segs = _wireframe_scene()
    rng = np.random.RandomState(3)
    ex = PPGExtractor(CAM)
    rig = Rig(CAM, freq=200.0)
    wmap = Map(rig)
    Map.imu_ini_time = 1e9  # visual-only: IMU init never triggers
    tracking = Tracking(wmap, ex)
    lm = LocalMapping(wmap, tracking=tracking)
    tracking.local_mapper = lm

    # sideways translation with a touch of yaw: strong parallax for init
    n_frames = 10
    feats_per_frame = []
    for k in range(n_frames):
        t = k / 10.0
        yaw = 0.02 * k
        Rcw = np.array([[np.cos(yaw), 0, -np.sin(yaw)],
                        [0, 1, 0],
                        [np.sin(yaw), 0, np.cos(yaw)]], np.float64)
        Cw = np.array([0.25 * k, 0.0, 0.0])
        tcw = -Rcw @ Cw
        img = _render(segs, Rcw, tcw, rng)
        tracking.grab_image(img, 0.05 * k + 0.0)
        feats_per_frame.append(tracking.current.kp.shape[0]
                               if tracking.current is not None else 0)
    return wmap, tracking, feats_per_frame


class TestRealExtractorPipeline:
    def test_extractor_yields_rich_features(self, real_run):
        wmap, tracking, n_kp = real_run
        assert min(n_kp) > 60, n_kp

    def test_monocular_init_succeeded(self, real_run):
        wmap, tracking, _ = real_run
        assert wmap.n_keyframes() >= 2, "two-view init must create 2 KFs"
        assert wmap.n_map_points() > 40, wmap.n_map_points()

    def test_tracking_stays_ok(self, real_run):
        wmap, tracking, _ = real_run
        assert tracking.state == 1, f"state={tracking.state}"

    def test_map_has_edges_from_real_graph(self, real_run):
        wmap, tracking, _ = real_run
        assert len(wmap.map_edges) > 5, len(wmap.map_edges)
