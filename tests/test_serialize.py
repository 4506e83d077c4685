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


def test_resume_from_map_relocalizes(tmp_path):
    """Checkpoint/RESUME (System(load_map_path=), CLI --load-map): load a
    saved map with a vocabulary — the BoW inverted file is re-indexed on
    load even though the map was built without one — start tracking LOST,
    relocalize into the loaded map, and keep tracking without a reset."""
    import map_store
    from synthetic_sequence import SyntheticExtractor
    from synthetic_world import CAM
    from ppg_slam_tpu.bow import Vocabulary
    from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
    from ppg_slam_tpu.pipeline.tracking import LOST, OK, Tracking
    from ppg_slam_tpu.worldmap import Rig, load_map, save_map

    voc_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "voc_euroc_9x3.npz")
    if not os.path.exists(voc_path):
        pytest.skip("vocabulary asset not available")
    entry = map_store.STORE.get("straight")
    p = tmp_path / "resume.ppgmap"
    if entry is not None:  # full-suite run: reuse the donated e2e map
        data, seq = entry
        p.write_bytes(data)
    else:  # standalone module run
        wmap0, tr = build_small_map(60)
        seq = tr.extractor.seq
        save_map(wmap0, str(p))
    wmap = load_map(str(p), vocabulary=Vocabulary.load(voc_path),
                    rig=Rig(CAM, freq=200.0))
    assert wmap.inverted_file, "BoW re-index on load must populate it"

    # resume by replaying the tail of the ORIGINAL sequence (a continuing
    # clock over already-mapped terrain)
    start = seq.n_frames - 20
    ex = SyntheticExtractor(seq)
    ex.frame_idx = start
    tracking = Tracking(wmap, ex)
    tracking.local_mapper = LocalMapping(wmap, tracking=tracking)
    tracking.resume_from_map()
    assert tracking.state == LOST
    n_kf0 = wmap.n_keyframes()

    states = []
    last_t = seq.frame_times[start - 1]
    for i in range(start, seq.n_frames):
        t = seq.frame_times[i]
        tracking.grab_imu(seq.imu_between(last_t, t))
        last_t = t
        tracking.grab_image(np.zeros((2, 2), np.uint8), t)
        states.append(tracking.state)
    assert tracking.n_resets == 0, "resume must never reset the loaded map"
    assert states[-1] == OK, states
    assert wmap.n_keyframes() >= n_kf0
