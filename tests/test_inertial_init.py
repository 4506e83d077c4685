"""IMU initialization: recover gravity direction, scale, velocities, biases."""

import numpy as np

import jax.numpy as jnp

from ppg_slam_tpu.geometry import so3
from ppg_slam_tpu.imu import integrate, GRAVITY_VALUE
from ppg_slam_tpu.estimator.inertial_init import (
    InertialInitProblem,
    inertial_optimization,
)

RNG = np.random.RandomState(23)


def simulate(n_kf=8, hz=200, kf_dt=0.5, bias_g=None, bias_a=None):
    """Simulate body motion in the metric gravity-aligned world with the
    discrete midpoint model the preintegration assumes."""
    g = np.float32([0, 0, -GRAVITY_VALUE])
    bias_g = np.zeros(3, np.float32) if bias_g is None else bias_g
    bias_a = np.zeros(3, np.float32) if bias_a is None else bias_a
    dt = 1.0 / hz
    steps_per_kf = int(kf_dt * hz)

    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    v = np.float32([0.4, 0.1, 0.0])
    w_body = np.float32([0.1, -0.15, 0.2])

    Rs, ts, vs = [R.copy()], [t.copy()], [v.copy()]
    segments = []
    for k in range(n_kf - 1):
        acc, gyr = [], []
        for i in range(steps_per_kf):
            # varying world acceleration
            a_w = np.float32([0.6 * np.sin(0.02 * (k * steps_per_kf + i)),
                              0.4 * np.cos(0.03 * (k * steps_per_kf + i)),
                              0.2 * np.sin(0.015 * (k * steps_per_kf + i))])
            a_body = (R.T @ (a_w - g)).astype(np.float32)
            acc.append(a_body + bias_a)
            gyr.append(w_body + bias_g)
            t = t + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.asarray(so3.exp(jnp.asarray(w_body * dt)), np.float32)
        segments.append((np.stack(acc), np.stack(gyr),
                         np.full(steps_per_kf, dt, np.float32)))
        Rs.append(R.copy())
        ts.append(t.copy())
        vs.append(v.copy())
    return np.stack(Rs), np.stack(ts), np.stack(vs), segments


def _sqrt_info(state):
    """Whitening factor from the real preintegration covariance (like the
    production assembler: Info = C[:9,:9]^-1, PSD-projected)."""
    C9 = np.asarray(state.C, np.float64)[:9, :9]
    info = np.linalg.inv(0.5 * (C9 + C9.T) + 1e-12 * np.eye(9))
    w, V = np.linalg.eigh(0.5 * (info + info.T))
    w = np.clip(w, 0, None)
    return jnp.asarray((V * np.sqrt(w)) @ V.T, jnp.float32)


def build_problem(segments, bias0=None):
    bias0 = np.zeros(6, np.float32) if bias0 is None else bias0
    nga = np.full(6, 1e-6, np.float32)
    states = []
    for acc, gyr, dt in segments:
        n = len(dt)
        states.append(integrate(jnp.asarray(acc), jnp.asarray(gyr),
                                jnp.asarray(dt), jnp.ones(n, bool),
                                jnp.asarray(bias0), nga, nga))
    L = len(states)
    return InertialInitProblem(
        kf1=jnp.arange(L, dtype=jnp.int32),
        kf2=jnp.arange(1, L + 1, dtype=jnp.int32),
        dR=jnp.stack([s.dR for s in states]),
        dV=jnp.stack([s.dV for s in states]),
        dP=jnp.stack([s.dP for s in states]),
        JRg=jnp.stack([s.JRg for s in states]),
        JVg=jnp.stack([s.JVg for s in states]),
        JVa=jnp.stack([s.JVa for s in states]),
        JPg=jnp.stack([s.JPg for s in states]),
        JPa=jnp.stack([s.JPa for s in states]),
        b0=jnp.tile(jnp.asarray(bias0), (L, 1)),
        sqi=jnp.stack([_sqrt_info(s) for s in states]),
        dt=jnp.stack([s.dT for s in states]),
        valid=jnp.ones(L, bool),
    )


class TestInertialInit:
    def test_recovers_scale_and_gravity(self):
        Rs, ts, vs, segments = simulate()
        prob = build_problem(segments)

        # visual world: rotated + scaled version of the metric world
        Rv = np.asarray(so3.exp(jnp.asarray([0.15, -0.1, 0.3])), np.float32)
        s_true = 2.5
        R_vis = np.einsum("ij,njk->nik", Rv, Rs).astype(np.float32)
        t_vis = (ts @ Rv.T / s_true).astype(np.float32)
        v_init = np.zeros_like(vs)  # unknown velocities

        v_f, bg, ba, Rwg, scale, hist = inertial_optimization(
            jnp.asarray(R_vis), jnp.asarray(t_vis), jnp.asarray(v_init),
            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jnp.asarray(1.0, jnp.float32),
            prob, prior_g=1e2, prior_a=1e6, iters=60)

        assert abs(float(scale) - s_true) / s_true < 0.02
        # gravity direction in visual world = Rv @ (0,0,-1)
        g_est = np.asarray(Rwg) @ np.float32([0, 0, -1])
        g_true = Rv @ np.float32([0, 0, -1])
        assert np.dot(g_est, g_true) > 0.9995
        # velocities (visual units) = Rv v_true / s
        v_true_vis = vs @ Rv.T / s_true
        np.testing.assert_allclose(np.asarray(v_f), v_true_vis, atol=0.03)
        assert np.abs(np.asarray(bg)).max() < 5e-3
        chi = np.asarray(hist)
        assert chi[-1] < chi[0] * 1e-3

    def test_recovers_gyro_bias(self):
        bg_true = np.float32([0.02, -0.015, 0.01])
        Rs, ts, vs, segments = simulate(bias_g=bg_true)
        prob = build_problem(segments)
        v_f, bg, ba, Rwg, scale, hist = inertial_optimization(
            jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(vs),
            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jnp.asarray(1.0, jnp.float32),
            prob, prior_g=1e2, prior_a=1e6, iters=60)
        np.testing.assert_allclose(np.asarray(bg), bg_true, atol=2e-3)
        assert abs(float(scale) - 1.0) < 0.02

    def test_scale_refinement_variant(self):
        Rs, ts, vs, segments = simulate()
        prob = build_problem(segments)
        s_true = 1.3
        t_vis = (ts / s_true).astype(np.float32)
        v_vis = (vs / s_true).astype(np.float32)
        v_f, bg, ba, Rwg, scale, hist = inertial_optimization(
            jnp.asarray(Rs), jnp.asarray(t_vis), jnp.asarray(v_vis),
            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.eye(3, dtype=jnp.float32), jnp.asarray(1.0, jnp.float32),
            prob, prior_g=0.0, prior_a=0.0, fix_vel_bias=True, iters=40)
        assert abs(float(scale) - s_true) / s_true < 0.05
