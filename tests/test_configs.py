"""Shipped dataset configs construct a working System (config regression:
configs/*.yaml mirror /root/reference/config/*.yaml — EuRoC pinhole+radtan,
TUM-VI 512/1024 KB8, UMA 1024x768 KB8)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "euroc.yaml": (752, 480, False),
    "tumvi.yaml": (512, 512, True),
    "tumvi1024.yaml": (1024, 1024, True),
    "uma.yaml": (1024, 768, True),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_config_builds_system(name):
    from ppg_slam_tpu.pipeline.system import System

    w, h, fisheye = CONFIGS[name]
    sys_ = System(None, os.path.join(REPO, "configs", name))
    cam = sys_.map.rig.cam
    assert (cam.width, cam.height) == (w, h)
    assert cam.is_fisheye == fisheye
    # IMU noise was scaled by sqrt(freq) at load (System.cpp:97-98)
    assert np.all(sys_.map.rig.nga > 0)
    # the extractor's undistortion bands exist for distorted cameras
    assert sys_.extractor._remap_xy is not None
    assert sys_.tracking.state == -1  # NO_IMAGES_YET, fresh map


def test_config_values_match_reference_euroc():
    """Spot-check EuRoC intrinsics against the reference config values."""
    from ppg_slam_tpu.pipeline.system import load_settings

    s = load_settings(os.path.join(REPO, "configs", "euroc.yaml"))
    assert abs(s["fx"] - 458.654) < 1e-6
    assert abs(s["view_cos_th"] - 0.85) < 1e-9
    assert s["imu_freq"] == 200.0
