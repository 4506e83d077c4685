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
                 noise_px=0.0, desc_noise=0.02, scene=None, accel_fn=None,
                 v0=(0.25, 0.0, 0.05), gyro_fn=None,
                 imu_noise=(0.0, 0.0)):
        # imu_noise: (gyro sigma rad/s, accel sigma m/s^2) white noise added
        # to the MEASUREMENTS only (ground truth integrates the clean
        # signal) — coasting on IMU then genuinely drifts.
        # corridor scene covering the whole flight path: the trajectory
        # integrates to ~[5.5, 1.5, 1.5], so a start-only point cloud runs
        # out of view by frame ~70 (tracking then rightly coasts on IMU)
        self.scene = scene or SyntheticScene(
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
        v = np.float32(v0)

        _imu_rng = np.random.RandomState(seed + 991)
        self.frame_poses = [(R.copy(), t.copy())]   # Twb (R=Rwb, t=twb)
        self.frame_vels = [v.copy()]
        self.frame_times = [0.0]
        self.imu = []  # rows (ax..az, wx..wz, t)

        if accel_fn is None:
            accel_fn = lambda tm: np.float32([
                0.8 * np.sin(1.1 * tm),
                0.5 * np.cos(0.9 * tm),
                0.35 * np.sin(1.4 * tm),
            ])
        if gyro_fn is None:
            gyro_fn = lambda tm: np.float32([
                0.10 * np.sin(0.6 * tm),
                0.22 * np.cos(0.5 * tm),
                0.15 * np.sin(0.8 * tm),
            ])

        k = 0
        for fidx in range(1, n_frames):
            for _ in range(steps_per_frame):
                tm = k * dt
                a_w = accel_fn(tm)
                w_b = gyro_fn(tm)
                a_body = (R.T @ (a_w - g)).astype(np.float32)
                if imu_noise[0] or imu_noise[1]:
                    a_meas = a_body + _imu_rng.randn(3).astype(
                        np.float32) * imu_noise[1]
                    w_meas = w_b + _imu_rng.randn(3).astype(
                        np.float32) * imu_noise[0]
                else:
                    a_meas, w_meas = a_body, w_b
                self.imu.append(np.concatenate(
                    [a_meas, w_meas, [tm + dt]]).astype(np.float64))
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


def make_ring_scene(n_points=1200, seed=11, r_in=7.0, r_out=10.0,
                    center=(3.0, 0.0, 0.0)):
    """Annulus of landmarks around the loop circle's center: each camera
    heading sees only its local arc, so opposite sides of the loop share no
    landmarks (the covisibility graph cannot silently bridge the loop)."""
    rng = np.random.RandomState(seed)
    scene = SyntheticScene(n_points=24, seed=seed)  # reuse line machinery
    phi = rng.uniform(0, 2 * np.pi, n_points)
    rr = rng.uniform(r_in, r_out, n_points)
    y = rng.uniform(-2.0, 2.5, n_points)
    pts = np.stack([center[0] + rr * np.sin(phi), center[1] + y,
                    center[2] + rr * np.cos(phi)], 1).astype(np.float32)
    scene.points = np.concatenate([pts, scene.points]).astype(np.float32)
    # the 24 line points from the box scene sit near the start view
    shift = len(pts)
    scene.triplets = [(a + shift, b + shift, c + shift)
                      for (a, b, c) in scene.triplets]
    scene.segments = [(a + shift, b + shift) for (a, b) in scene.segments]
    scene.n = len(scene.points)
    d = rng.randn(scene.n, 256).astype(np.float32)
    scene.descs = d / np.linalg.norm(d, axis=1, keepdims=True)
    return scene


def make_loop_sequence(n_frames=240, fps=20.0, noise_px=0.5, seed=11):
    """Closed circular trajectory with tangent heading — the textbook loop:

      p(t) = Rc * [1 - cos(w t), 0, sin(w t)],  R(t) = Ry(w t)

    so the body yaws a full 360 deg while circling (constant gyro [0, w, 0]),
    always looking at the local arc of a landmark ring. Yaw is unobservable
    monocular-inertially, so it drifts with noise; start and far side share
    NO landmarks, so on return the accumulated drift must be absorbed by
    loop closure (the revisit keyframes are not covisible with the start).
    Closes exactly at t = T.
    """
    T = (n_frames - 1) / fps
    w = 2 * np.pi / T
    Rc = 3.0
    # modulate the angular speed: theta(t) = w t + A sin(W t). A CONSTANT
    # rate makes the body-frame accel constant (pure rotating centripetal +
    # gravity), leaving metric scale unobservable to the IMU — init then
    # locks a wrong scale and the whole run degrades.
    A, W = 0.35, 1.1

    def theta(tm):
        return w * tm + A * np.sin(W * tm)

    def dtheta(tm):
        return w + A * W * np.cos(W * tm)

    def ddtheta(tm):
        return -A * W * W * np.sin(W * tm)

    def accel(tm):
        th, d1, d2 = theta(tm), dtheta(tm), ddtheta(tm)
        return np.float32([
            Rc * (d2 * np.sin(th) + d1 * d1 * np.cos(th)),
            -0.15 * 1.3 * 1.3 * np.sin(1.3 * tm),
            Rc * (d2 * np.cos(th) - d1 * d1 * np.sin(th)),
        ])

    def gyro(tm):
        return np.float32([0.0, dtheta(tm), 0.0])

    scene = make_ring_scene(seed=seed, center=(Rc, 0.0, 0.0))
    return SyntheticSequence(
        n_frames=n_frames, fps=fps, noise_px=noise_px, seed=seed,
        scene=scene, accel_fn=accel, gyro_fn=gyro,
        v0=(0.0, 0.15 * 1.3, Rc * dtheta(0.0)))
