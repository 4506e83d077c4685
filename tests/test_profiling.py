"""Observability tests: the per-stage profiler and its pipeline wiring."""

import time

import numpy as np

from ppg_slam_tpu.utils import Profiler, profiler
from ppg_slam_tpu.utils.profiling import _Stat


class TestProfiler:
    def test_timer_accumulates(self):
        p = Profiler()
        for _ in range(3):
            with p.timer("stage.a"):
                time.sleep(0.002)
        s = p.summary()["stage.a"]
        assert s["count"] == 3
        assert s["mean_ms"] >= 1.0
        assert s["max_ms"] >= s["mean_ms"]

    def test_counters_and_report(self):
        p = Profiler()
        p.count("frames", 5)
        p.count("frames")
        with p.timer("x"):
            pass
        assert p.summary()["counters"]["frames"] == 6
        rep = p.report()
        assert "frames" in rep and "x" in rep

    def test_disabled_is_noop(self):
        p = Profiler(enabled=False)
        with p.timer("y"):
            pass
        p.count("c")
        assert p.summary() == {}

    def test_reset(self):
        p = Profiler()
        with p.timer("z"):
            pass
        p.reset()
        assert p.summary() == {}


class TestPipelineWiring:
    def test_tracking_stages_recorded(self):
        """Running the pipeline populates the global profiler."""
        from synthetic_sequence import SyntheticExtractor, SyntheticSequence
        from synthetic_world import CAM
        from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
        from ppg_slam_tpu.pipeline.tracking import Tracking
        from ppg_slam_tpu.worldmap import Map, Rig

        profiler.reset()
        seq = SyntheticSequence(n_frames=12)
        rig = Rig(CAM, freq=200.0)
        wmap = Map(rig)
        tracking = Tracking(wmap, SyntheticExtractor(seq))
        lm = LocalMapping(wmap, tracking=tracking)
        tracking.local_mapper = lm
        last_t = -1.0
        for i in range(seq.n_frames):
            t = seq.frame_times[i]
            tracking.grab_imu(seq.imu_between(last_t, t))
            last_t = t
            tracking.grab_image(np.zeros((2, 2), np.uint8), t)
        s = profiler.summary()
        assert s["counters"]["frames"] == 12
        assert "tracking.extract" in s and "tracking.track" in s
        assert s["tracking.track"]["count"] == 12
        assert "tracking.preintegrate" in s
