"""CLI end-to-end: EuRoC-layout dataset on disk -> mono_inertial.run ->
trajectories + offline renders.

Exercises the full user surface in one pass: ASL CSV dataset loaders
(datasets/loaders.py; reference try_euroc.cpp:28-77), OpenCV-YAML settings
parsing, System construction with the real PPGExtractor, per-frame
track_monocular with IMU routing, the offline viewer renders, trajectory
writers on shutdown, and the per-stage profiler summary."""

import os

import numpy as np
import pytest

from test_real_extractor_pipeline import CAM, _render, _wireframe_scene

YAML = """%YAML:1.0
---
Camera.type: "PinHole"
Camera.fx: {fx}
Camera.fy: {fy}
Camera.cx: {cx}
Camera.cy: {cy}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {w}
Camera.height: {h}
Camera.fps: 20.0
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200.0
IMU.IniTime: 1.0e9
ViewCosTh: 0.85
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.0,
          0.0, 1.0, 0.0, 0.0,
          0.0, 0.0, 1.0, 0.0,
          0.0, 0.0, 0.0, 1.0]
"""


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("euroc_synth")
    cam_dir = root / "mav0" / "cam0" / "data"
    imu_dir = root / "mav0" / "imu0"
    cam_dir.mkdir(parents=True)
    imu_dir.mkdir(parents=True)

    segs = _wireframe_scene()
    rng = np.random.RandomState(4)
    n_frames, fps = 12, 20.0
    lines = []
    for k in range(n_frames):
        yaw = 0.02 * k
        Rcw = np.array([[np.cos(yaw), 0, -np.sin(yaw)],
                        [0, 1, 0],
                        [np.sin(yaw), 0, np.cos(yaw)]], np.float64)
        Cw = np.array([0.18 * k, 0.0, 0.0])
        img = _render(segs, Rcw, -Rcw @ Cw, rng)
        ns = int((10.0 + k / fps) * 1e9)
        cv2.imwrite(str(cam_dir / f"{ns}.png"), img)
        lines.append(f"{ns},{ns}.png")
    (root / "mav0" / "cam0" / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(lines) + "\n")

    # gravity-only IMU at 200 Hz (visual-only run: IniTime = 1e9)
    imu_rows = []
    t = 10.0 - 0.05
    while t < 10.0 + n_frames / fps + 0.05:
        imu_rows.append(f"{int(t * 1e9)},0.0,0.0,0.0,0.0,0.0,9.81")
        t += 1.0 / 200.0
    (imu_dir / "data.csv").write_text(
        "#timestamp [ns],w_RS_S_x,...\n" + "\n".join(imu_rows) + "\n")

    yaml_path = root / "settings.yaml"
    yaml_path.write_text(YAML.format(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx,
                                     cy=CAM.cy, w=CAM.width, h=CAM.height))
    return root


@pytest.fixture(scope="module")
def cli_run(dataset_dir, tmp_path_factory):
    from ppg_slam_tpu.cli.mono_inertial import run

    out = tmp_path_factory.mktemp("out")
    renders = out / "renders"
    stats = run("euroc", "", str(dataset_dir / "settings.yaml"), "",
                str(dataset_dir), out_dir=str(out), progress_every=0,
                render_dir=str(renders), render_every=6)
    return stats, out, renders


class TestCliE2E:
    def test_all_frames_tracked(self, cli_run):
        stats, out, renders = cli_run
        assert stats["frames"] == 12
        assert stats["keyframes"] >= 2
        assert stats["map_points"] > 40

    def test_trajectories_written(self, cli_run):
        stats, out, renders = cli_run
        cam_tr = (out / "CameraTrajectory.txt").read_text().strip()
        kf_tr = (out / "KeyFrameTrajectory.txt").read_text().strip()
        assert len(cam_tr.splitlines()) >= 10   # tracked frames, TUM format
        assert len(kf_tr.splitlines()) >= 2
        row = cam_tr.splitlines()[0].split()
        assert len(row) == 8  # t x y z qx qy qz qw

    def test_renders_written(self, cli_run):
        stats, out, renders = cli_run
        pngs = [p for p in os.listdir(renders) if p.endswith(".png")]
        assert len(pngs) >= 2, pngs

    def test_profiler_stages_reported(self, cli_run):
        stats, out, renders = cli_run
        assert "tracking.extract" in stats["stages"]
        assert stats["stages"]["tracking.extract"]["count"] == 12
