"""Fisheye (KannalaBrandt8) END-TO-END coverage: the real PPG extractor and
the tracking pipeline on a KB8 camera.

TUM-VI/UMA — half the reference's evaluation set — run the KB8 model
(/root/reference/sensors/src/KannalaBrandt8.cpp, config/TUM-VI.yaml). The
unit tests cover KB8 math; these tests exercise what only an end-to-end run
reaches: the banded heat-map undistortion remap at the 512x512 TUM-VI shape,
the fisheye distorted+undistorted keypoint bookkeeping
(PPGExtractor.cpp:141-146 keeps both for fisheye), and visual tracking on
KB8 projections.
"""

import numpy as np
import pytest

# Default lane: the extractor smoke (one 512^2 KB8 extraction + remap
# equivalence) — the only real-extractor fisheye coverage in the
# verification window. Slow lane: the full tracking pipeline below.

import jax.numpy as jnp

from ppg_slam_tpu.frontend import PPGExtractor
from ppg_slam_tpu.geometry.cameras import CAM_FISHEYE, CameraModel

# TUM-VI 512 cam0 calibration (configs/tumvi.yaml)
KB8 = CameraModel(
    kind=CAM_FISHEYE, fx=190.978477, fy=190.973307, cx=254.931706,
    cy=256.897442,
    dist=(0.003482389402, 0.000715034845, -0.002053236141, 0.000202936736),
    width=512, height=512)


def _wireframe_segments(seed=4):
    segs = []
    for x in np.linspace(-2.0, 2.0, 8):
        segs.append(((x, -1.6, 4.0), (x, 1.6, 4.0)))
    for y in np.linspace(-1.6, 1.6, 7):
        segs.append(((-2.0, y, 4.0), (2.0, y, 4.0)))
    rng = np.random.RandomState(seed)
    for _ in range(8):
        p = rng.uniform([-1.5, -1.2, 2.5], [1.5, 1.2, 3.8])
        q = p + rng.uniform([-1.0, -1.0, -0.3], [1.0, 1.0, 0.3])
        segs.append((tuple(p), tuple(q)))
    return np.asarray(segs, np.float64)


def _render_kb8(segs, Rcw, tcw, rng):
    """Render with the KB8 model itself: project sampled 3-D segment points
    through the equidistant distortion and draw short polylines — the image
    is genuinely fisheye-distorted (straight 3-D lines curve)."""
    import cv2

    img = np.full((KB8.height, KB8.width), 110, np.uint8)
    for p, q in segs:
        pts = np.linspace(p, q, 16)
        Pc = pts @ Rcw.T + tcw
        if (Pc[:, 2] < 0.3).any():
            continue
        uv = KB8.project_np(Pc.astype(np.float32))
        if not np.isfinite(uv).all():
            continue
        cv2.polylines(img, [np.round(uv).astype(np.int32)], False, 230, 2,
                      lineType=cv2.LINE_AA)
    noise = rng.randint(-8, 8, img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def kb8_extractor():
    return PPGExtractor(KB8)


@pytest.fixture(scope="module")
def kb8_feats(kb8_extractor):
    rng = np.random.RandomState(1)
    img = _render_kb8(_wireframe_segments(), np.eye(3),
                      np.zeros(3), rng)
    return kb8_extractor.extract(img), img


class TestKB8Extractor:
    def test_detects_structure(self, kb8_feats):
        feats, _ = kb8_feats
        assert feats.n_kp > 40, feats.n_kp
        assert len(feats.edges) > 10, len(feats.edges)

    def test_keeps_distorted_and_undistorted(self, kb8_feats):
        """Fisheye keeps mPos (distorted) and mPosUn separately
        (PPGExtractor.cpp:141-146); pinhole overwrites mPos."""
        feats, _ = kb8_feats
        d = np.linalg.norm(feats.kp_pos - feats.kp_pos_un, axis=1)
        assert feats.kp_pos.shape == feats.kp_pos_un.shape
        assert d.max() > 0.5, "fisheye undistortion must move points"

    def test_undistortion_consistent_with_camera(self, kb8_feats):
        feats, _ = kb8_feats
        un = np.asarray(KB8.undistort_points(jnp.asarray(feats.kp_pos)))
        ok = ~feats.kp_out
        np.testing.assert_allclose(un[ok], feats.kp_pos_un[ok], atol=2e-2)

    def test_banded_remap_matches_host_remap(self, kb8_extractor, kb8_feats):
        """The device banded heat remap at the 512^2 KB8 shape equals the
        host cv::remap-spec implementation."""
        _, img = kb8_feats
        dev = kb8_extractor.device_heat(img)
        import jax

        from ppg_slam_tpu.models import ppg_forward
        from ppg_slam_tpu.ops.heatmap import refine_heatmap

        out = ppg_forward(kb8_extractor.params,
                          jnp.asarray(img)[None, :, :, None].astype(
                              jnp.float32) / 255.0)
        heat = np.asarray(refine_heatmap(out["heat"][0]))
        host = kb8_extractor.remap_heat_host(heat)
        np.testing.assert_allclose(dev, host, atol=1e-4)


@pytest.mark.slow  # multi-frame 512^2 CNN tracking: opt-in lane
class TestKB8Pipeline:
    def test_visual_tracking(self, kb8_extractor):
        """Short KB8 sequence through the real pipeline: init + tracking."""
        from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
        from ppg_slam_tpu.pipeline.tracking import OK, Tracking
        from ppg_slam_tpu.worldmap import Map, Rig, reset_ids

        reset_ids()
        segs = _wireframe_segments()
        rng = np.random.RandomState(2)
        rig = Rig(KB8, freq=200.0)
        wmap = Map(rig)
        Map.imu_ini_time = 1e9  # visual-only
        tracking = Tracking(wmap, kb8_extractor)
        tracking.local_mapper = LocalMapping(wmap, tracking=tracking)

        n = 8
        states = []
        for k in range(n):
            t = np.array([0.06 * k, 0.01 * k, 0.0])
            yaw = 0.004 * k
            Rcw = np.array([[np.cos(yaw), 0, -np.sin(yaw)], [0, 1, 0],
                            [np.sin(yaw), 0, np.cos(yaw)]], np.float64)
            tcw = -Rcw @ t
            img = _render_kb8(segs, Rcw, tcw, rng)
            frame = tracking.grab_image(img, k * 0.05)
            states.append(tracking.state)
        assert OK in states, states
        assert states[-1] == OK, states
        assert wmap.n_map_points() > 30
        # KB8 triangulated landmarks must sit near the rendered wall depth
        zs = np.array([mp.pos[2] for mp in wmap.all_map_points()])
        scale = np.median(zs) / 4.0  # monocular scale is arbitrary
        assert 0.05 < scale, "degenerate depths"
