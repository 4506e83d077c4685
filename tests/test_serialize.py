"""Map save/load round trip (checkpointing — SURVEY.md §5 rebuild addition)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_small_map(n_frames=40):
    """A tiny tracked map via the real pipeline on the synthetic sequence."""
    from synthetic_sequence import SyntheticExtractor, SyntheticSequence
    from synthetic_world import CAM
    from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
    from ppg_slam_tpu.pipeline.tracking import Tracking
    from ppg_slam_tpu.worldmap import Map, Rig

    seq = SyntheticSequence(n_frames=n_frames)
    rig = Rig(CAM, freq=200.0)
    wmap = Map(rig)
    Map.imu_ini_time = 2.0
    tracking = Tracking(wmap, SyntheticExtractor(seq))
    lm = LocalMapping(wmap, tracking=tracking)
    tracking.local_mapper = lm
    last_t = -1.0
    for i in range(seq.n_frames):
        t = seq.frame_times[i]
        tracking.grab_imu(seq.imu_between(last_t, t))
        last_t = t
        tracking.grab_image(np.zeros((2, 2), np.uint8), t)
    return wmap, tracking


@pytest.fixture(scope="module")
def small_map():
    # reuse the pipeline-e2e module's tracked map when the full suite runs
    # (fresh deserialized copy); standalone runs build their own
    import map_store

    wmap = map_store.get_map("straight")
    if wmap is not None:
        return wmap
    wmap, _ = build_small_map()
    return wmap


def test_save_load_round_trip(small_map, tmp_path_factory):
    from ppg_slam_tpu.worldmap import load_map, save_map

    assert small_map.n_keyframes() >= 3
    path = str(tmp_path_factory.mktemp("maps") / "m.ppgmap")
    save_map(small_map, path)
    loaded = load_map(path)

    assert len(loaded.keyframes) == len(small_map.keyframes)
    assert len(loaded.map_points) == len(small_map.map_points)
    assert len(loaded.map_edges) == len(small_map.map_edges)
    assert len(loaded.map_colines) == len(small_map.map_colines)

    by_id = {kf.mnId: kf for kf in small_map.keyframes}
    for kf in loaded.keyframes:
        np.testing.assert_allclose(kf.Rcw, by_id[kf.mnId].Rcw, atol=1e-7)
        np.testing.assert_allclose(kf.tcw, by_id[kf.mnId].tcw, atol=1e-7)
        # cross-references survive: observations point into the loaded map
        for mp in kf.get_map_point_matches():
            if mp is not None and not mp.bad:
                assert mp in loaded.map_points

    # covisibility graph survives
    kf0 = max(loaded.keyframes, key=lambda k: len(k.get_map_point_matches()))
    src = by_id[kf0.mnId]
    assert (len(kf0.get_connected_keyframes())
            == len(src.get_connected_keyframes()))

    # id counters advanced: new elements don't collide
    from ppg_slam_tpu.worldmap.elements import MapPoint
    ids = {mp.mnId for mp in loaded.map_points}
    ref_kf = next(iter(loaded.keyframes))
    new_mp = MapPoint(np.zeros(3, np.float32), ref_kf)
    assert new_mp.mnId not in ids


def test_loaded_map_keeps_tracking(small_map, tmp_path):
    """Resume-from-checkpoint: the loaded map serves place recognition and
    lookups without touching the original objects."""
    from ppg_slam_tpu.worldmap import load_map, save_map

    path = str(tmp_path / "m.ppgmap")
    save_map(small_map, path)
    loaded = load_map(path)
    # mutate the loaded copy; the original must be untouched
    n0 = len(small_map.map_points)
    victim = next(iter(loaded.map_points))
    loaded.erase_map_point(victim)
    assert len(small_map.map_points) == n0
    assert len(loaded.map_points) == n0 - 1


def test_load_rejects_garbage(tmp_path):
    from ppg_slam_tpu.worldmap import load_map

    p = tmp_path / "junk.bin"
    p.write_bytes(b"NOTAMAP00")
    with pytest.raises(ValueError):
        load_map(str(p))
