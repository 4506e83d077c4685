"""Synthetic mono-inertial sequence: trajectory + IMU + rendered features.

Simulates body motion at IMU rate with the same discrete model the
preintegration assumes, so preintegrated deltas are exactly consistent with
the frame poses. Used by the end-to-end pipeline tests (the dataset-free
analog of EuRoC MH_01 for minimum-slice gate #2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ppg_slam_tpu.geometry import so3
from ppg_slam_tpu.imu import GRAVITY_VALUE

from synthetic_world import CAM, SyntheticScene


class SyntheticSequence:
    def __init__(self, n_frames=120, fps=20.0, imu_hz=200.0, seed=3,
                 noise_px=0.0, desc_noise=0.02):
        # corridor scene covering the whole flight path: the trajectory
        # integrates to ~[5.5, 1.5, 1.5], so a start-only point cloud runs
        # out of view by frame ~70 (tracking then rightly coasts on IMU)
        self.scene = SyntheticScene(
            n_points=480, seed=seed, extent=((-3, 9), (-2, 4), (4, 10)))
        self.fps = fps
        self.noise_px = noise_px
        self.desc_noise = desc_noise
        g = np.float32([0, 0, -GRAVITY_VALUE])
        dt = 1.0 / imu_hz
        steps_per_frame = int(round(imu_hz / fps))

        # body starts at origin looking at the cloud (+z)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        v = np.float32([0.25, 0.0, 0.05])

        self.frame_poses = [(R.copy(), t.copy())]   # Twb (R=Rwb, t=twb)
        self.frame_vels = [v.copy()]
        self.frame_times = [0.0]
        self.imu = []  # rows (ax..az, wx..wz, t)

        k = 0
        for fidx in range(1, n_frames):
            for _ in range(steps_per_frame):
                tm = k * dt
                a_w = np.float32([
                    0.8 * np.sin(1.1 * tm),
                    0.5 * np.cos(0.9 * tm),
                    0.35 * np.sin(1.4 * tm),
                ])
                w_b = np.float32([
                    0.10 * np.sin(0.6 * tm),
                    0.22 * np.cos(0.5 * tm),
                    0.15 * np.sin(0.8 * tm),
                ])
                a_body = (R.T @ (a_w - g)).astype(np.float32)
                self.imu.append(np.concatenate(
                    [a_body, w_b, [tm + dt]]).astype(np.float64))
                t = t + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = (R @ np.asarray(so3.exp(jnp.asarray(w_b * dt)),
                                    np.float32))
                k += 1
            self.frame_poses.append((R.copy(), t.copy()))
            self.frame_vels.append(v.copy())
            self.frame_times.append(k * dt)
        self.imu = np.stack(self.imu)
        self.n_frames = n_frames

    def frame_tcw(self, i):
        Rwb, twb = self.frame_poses[i]
        Rcw = Rwb.T  # identity extrinsics: camera == body
        tcw = (-Rcw @ twb).astype(np.float32)
        return Rcw, tcw

    def imu_between(self, t0, t1):
        m = self.imu
        sel = (m[:, 6] > t0) & (m[:, 6] <= t1 + 1e-9)
        return m[sel]


class SyntheticExtractor:
    """Drop-in replacement for PPGExtractor driven by the scene + frame idx."""

    def __init__(self, seq: SyntheticSequence):
        self.seq = seq
        self.frame_idx = 0
        self.last_ids = None

    def extract(self, image):
        i = self.frame_idx
        self.frame_idx += 1
        Rcw, tcw = self.seq.frame_tcw(i)
        feats, ids = self.seq.scene.render(
            Rcw, tcw, noise=self.seq.noise_px,
            desc_noise=self.seq.desc_noise)
        self.last_ids = ids
        return feats
