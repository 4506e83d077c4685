"""Offline viewer tests (headless MSViewing equivalent, viz/viewer.py).

Covers the reference viewer behaviors (Viewer.cpp:66-447): frame overlay
(colines/edges/tracked points + text bar), 3-D map render (points, edges,
colines, keyframe axes, covisibility graph, inertial chain, camera frustum),
time-based fading, step-by-step debug gate, and PNG dumping through the
pipeline hook.
"""

import os

import numpy as np
import pytest

from synthetic_sequence import SyntheticExtractor, SyntheticSequence
from synthetic_world import CAM

from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
from ppg_slam_tpu.pipeline.tracking import OK, Tracking
from ppg_slam_tpu.viz import Canvas3D, Viewer, look_at
from ppg_slam_tpu.worldmap import Map, Rig


class TestRender:
    def test_look_at_forward(self):
        R, t = look_at(np.array([0.0, 0.0, -5.0]), np.zeros(3),
                       np.array([0.0, -1.0, 0.0]))
        # eye on -z looking at origin: origin is 5 ahead in view coords
        v = R @ np.zeros(3) + t
        assert v[2] == pytest.approx(5.0, abs=1e-5)
        # point behind eye is not visible
        c = Canvas3D(64, 64)
        c.R, c.t = R, t
        _, ok = c.project(np.array([[0.0, 0.0, -10.0]]))
        assert not ok[0]

    def test_canvas_draws_points_and_lines(self):
        c = Canvas3D(128, 128, focal=100.0)
        c.set_view(np.array([0.0, 0.0, -3.0]), np.zeros(3),
                   np.array([0.0, -1.0, 0.0]))
        c.lines(np.array([[-0.5, 0.0, 0.0]]), np.array([[0.5, 0.0, 0.0]]),
                (0, 0, 255), width=2)
        c.points(np.array([[0.0, 0.0, 0.0]]), (255, 0, 0), size=4)
        a = c.array()
        assert a.shape == (128, 128, 3)
        assert (a != 255).any(), "canvas must not be blank"
        # center pixel is the red point
        assert tuple(a[64, 64]) == (255, 0, 0)


@pytest.fixture(scope="module")
def tracked_sequence(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("renders"))
    # 48 frames: 3 render_every=20 ticks, a tracked map, and IMU init
    # (imu_ini_time=2.0 s = frame 40) for the top-view test — the shortest
    # build that covers every viewer assertion
    seq = SyntheticSequence(n_frames=48)
    rig = Rig(CAM, freq=200.0)
    wmap = Map(rig)
    Map.imu_ini_time = 2.0
    ext = SyntheticExtractor(seq)
    tracking = Tracking(wmap, ext)
    lm = LocalMapping(wmap, tracking=tracking)
    tracking.local_mapper = lm
    viewer = Viewer(wmap, out_dir=out, render_every=20, show_graph=True)
    tracking.viewer = viewer

    last_t = -1.0
    for i in range(seq.n_frames):
        t = seq.frame_times[i]
        tracking.grab_imu(seq.imu_between(last_t, t))
        last_t = t
        tracking.grab_image(np.zeros((2, 2), np.uint8), t)
    return tracking, wmap, viewer, out


class TestViewer:
    def test_renders_written(self, tracked_sequence):
        _, _, viewer, out = tracked_sequence
        files = sorted(os.listdir(out))
        maps = [f for f in files if f.startswith("map_")]
        frames = [f for f in files if f.startswith("frame_")]
        assert len(maps) >= 2 and len(frames) >= 2

    def test_map_render_content(self, tracked_sequence):
        tracking, wmap, viewer, _ = tracked_sequence
        assert tracking.state == OK
        img = viewer.draw_map()
        assert img.shape == (768, 1024, 3)
        nonwhite = (img != 255).any(axis=2).mean()
        assert nonwhite > 0.001, "map render is blank"

    def test_frame_overlay_content(self, tracked_sequence):
        _, _, viewer, _ = tracked_sequence
        img = viewer.draw_frame()
        assert img.ndim == 3 and img.shape[2] == 3
        # text bar appended at the bottom with light text on black
        bar = img[-20:]
        assert (bar == 0).any() and (bar > 200).any()
        # tracked map points were counted
        assert viewer._n_tracked > 10

    def test_fading_monotonic(self, tracked_sequence):
        _, wmap, viewer, _ = tracked_sequence
        mps = [mp for mp in wmap.all_map_points() if not mp.is_bad()]
        ages = [viewer._age(mp.mnId, "mp") for mp in mps]
        # early-map points must be older than 0 by sequence end
        assert max(ages) > 0.5
        assert viewer._fade(0.0) == pytest.approx(1.0)
        assert viewer._fade(10.0) == pytest.approx(0.5)
        assert viewer._fade(19.0) == pytest.approx(0.1)
        # unfaded toggle pins age to 0
        viewer.unfaded = True
        assert viewer._age(mps[0].mnId, "mp") == 0.0
        viewer.unfaded = False

    def test_top_view_after_imu_init(self, tracked_sequence):
        _, wmap, viewer, _ = tracked_sequence
        assert wmap.imu_initialized
        viewer.top_view = True
        img = viewer.draw_map()
        viewer.top_view = False
        assert (img != 255).any()

    def test_step_gate(self, tracked_sequence):
        _, _, viewer, _ = tracked_sequence
        viewer.step_by_step = True
        hits = []

        def hook(v):
            hits.append(1)
            v.step()

        viewer.step_hook = hook
        viewer.wait_step()          # blocks until hook steps
        assert hits == [1]
        viewer.step()
        viewer.step_hook = lambda v: pytest.fail("step already queued")
        viewer.wait_step()          # pre-queued step passes immediately
        viewer.step_by_step = False
        viewer.step_hook = None
