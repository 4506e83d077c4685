"""IMU preintegration tests: numpy golden transcription + analytic cases."""

import numpy as np
import jax.numpy as jnp

from ppg_slam_tpu.imu import Preintegrated, integrate, corrected_deltas

RNG = np.random.RandomState(3)


def numpy_preintegrate(acc_list, gyr_list, dt_list, bias, nga, nga_walk):
    """Direct numpy transcription of IMU.cpp:218-276 (the behavioral spec)."""

    def hat(v):
        return np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float64
        )

    dR = np.eye(3)
    dV = np.zeros(3)
    dP = np.zeros(3)
    JRg = np.zeros((3, 3))
    JVg = np.zeros((3, 3))
    JVa = np.zeros((3, 3))
    JPg = np.zeros((3, 3))
    JPa = np.zeros((3, 3))
    C = np.zeros((15, 15))
    dT = 0.0
    bg, ba = bias[:3], bias[3:]
    for am, wm, dt in zip(acc_list, gyr_list, dt_list):
        acc = am - ba
        accW = wm - bg
        dP = dP + dV * dt + 0.5 * dR @ acc * dt * dt
        dV = dV + dR @ acc * dt
        Wacc = hat(acc)
        A = np.eye(9)
        B = np.zeros((9, 6))
        A[3:6, 0:3] = -dR * dt @ Wacc
        A[6:9, 0:3] = -0.5 * dR * dt * dt @ Wacc
        A[6:9, 3:6] = np.eye(3) * dt
        B[3:6, 3:6] = dR * dt
        B[6:9, 3:6] = 0.5 * dR * dt * dt
        JPa = JPa + JVa * dt - 0.5 * dR * dt * dt
        JPg = JPg + JVg * dt - 0.5 * dR * dt * dt @ Wacc @ JRg
        JVa = JVa - dR * dt
        JVg = JVg - dR * dt @ Wacc @ JRg
        # IntegratedRotation
        v = accW * dt
        d = np.linalg.norm(v)
        W = hat(v)
        if d < 1e-4:
            dRi = np.eye(3) + W
            rightJ = np.eye(3)
        else:
            dRi = (
                np.eye(3) + W * np.sin(d) / d + W @ W * (1 - np.cos(d)) / d**2
            )
            rightJ = (
                np.eye(3)
                - W * (1 - np.cos(d)) / d**2
                + W @ W * (d - np.sin(d)) / d**3
            )
        dR = dR @ dRi
        u, _, vt = np.linalg.svd(dR)
        dR = u @ vt
        A[0:3, 0:3] = dRi.T
        B[0:3, 0:3] = rightJ * dt
        C[:9, :9] = A @ C[:9, :9] @ A.T + B @ np.diag(nga) @ B.T
        C[9:, 9:] += np.diag(nga_walk)
        JRg = dRi.T @ JRg - rightJ * dt
        dT += dt
    return dict(dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg,
                JPa=JPa, C=C, dT=dT)


def make_meas(n=50):
    acc = (RNG.randn(n, 3) * 0.5 + [0, 0, 9.81]).astype(np.float32)
    gyr = (RNG.randn(n, 3) * 0.2).astype(np.float32)
    dt = np.full(n, 0.005, np.float32)
    return acc, gyr, dt


NGA = np.array([1.7e-4**2 * 200] * 3 + [2e-3**2 * 200] * 3, np.float32)
NGAW = np.array([1.94e-5**2 / 200] * 3 + [3e-3**2 / 200] * 3, np.float32)


class TestIntegrate:
    def test_matches_numpy_spec(self):
        acc, gyr, dt = make_meas(50)
        bias = np.array([0.01, -0.02, 0.005, 0.1, -0.05, 0.2], np.float32)
        valid = np.ones(50, bool)
        st = integrate(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
            jnp.asarray(valid), jnp.asarray(bias), jnp.asarray(NGA),
            jnp.asarray(NGAW),
        )
        ref = numpy_preintegrate(
            acc.astype(np.float64), gyr.astype(np.float64),
            dt.astype(np.float64), bias.astype(np.float64),
            NGA.astype(np.float64), NGAW.astype(np.float64),
        )
        np.testing.assert_allclose(np.asarray(st.dR), ref["dR"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(st.dV), ref["dV"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(st.dP), ref["dP"], atol=1e-4)
        for k in ("JRg", "JVg", "JVa", "JPg", "JPa"):
            np.testing.assert_allclose(
                np.asarray(getattr(st, k)), ref[k], atol=1e-4, rtol=1e-4
            )
        np.testing.assert_allclose(
            np.asarray(st.C), ref["C"], atol=1e-9, rtol=1e-3
        )
        assert abs(float(st.dT) - ref["dT"]) < 1e-6

    def test_padding_is_noop(self):
        acc, gyr, dt = make_meas(20)
        bias = np.zeros(6, np.float32)
        pad = 12
        accp = np.concatenate([acc, RNG.randn(pad, 3).astype(np.float32)])
        gyrp = np.concatenate([gyr, RNG.randn(pad, 3).astype(np.float32)])
        dtp = np.concatenate([dt, np.full(pad, 0.005, np.float32)])
        validp = np.concatenate([np.ones(20, bool), np.zeros(pad, bool)])
        st1 = integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                        jnp.ones(20, bool), bias, NGA, NGAW)
        st2 = integrate(jnp.asarray(accp), jnp.asarray(gyrp), jnp.asarray(dtp),
                        jnp.asarray(validp), bias, NGA, NGAW)
        np.testing.assert_allclose(np.asarray(st1.dP), np.asarray(st2.dP), atol=1e-7)
        np.testing.assert_allclose(np.asarray(st1.C), np.asarray(st2.C), atol=1e-12)

    def test_constant_motion_analytic(self):
        """Zero gyro, constant acc: dV = a*T, dP = 0.5*a*T^2, dR = I."""
        n = 100
        a = np.array([1.0, -2.0, 9.81], np.float32)
        acc = np.tile(a, (n, 1))
        gyr = np.zeros((n, 3), np.float32)
        dt = np.full(n, 0.01, np.float32)
        st = integrate(acc, gyr, dt, np.ones(n, bool),
                       np.zeros(6, np.float32), NGA, NGAW)
        T = n * 0.01
        np.testing.assert_allclose(np.asarray(st.dR), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st.dV), a * T, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st.dP), 0.5 * a * T * T, rtol=1e-3)

    def test_bias_correction_first_order(self):
        """corrected_deltas(b0, b0+db) ≈ re-integration at b0+db for small db."""
        acc, gyr, dt = make_meas(80)
        b0 = np.zeros(6, np.float32)
        db = np.array([2e-3, -1e-3, 1e-3, 5e-3, -3e-3, 4e-3], np.float32)
        valid = np.ones(80, bool)
        st0 = integrate(acc, gyr, dt, valid, b0, NGA, NGAW)
        st1 = integrate(acc, gyr, dt, valid, b0 + db, NGA, NGAW)
        dR, dV, dP = corrected_deltas(st0, jnp.asarray(b0), jnp.asarray(b0 + db))
        np.testing.assert_allclose(np.asarray(dR), np.asarray(st1.dR), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dV), np.asarray(st1.dV), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dP), np.asarray(st1.dP), atol=2e-4)

    def test_covariance_psd(self):
        acc, gyr, dt = make_meas(60)
        st = integrate(acc, gyr, dt, np.ones(60, bool),
                       np.zeros(6, np.float32), NGA, NGAW)
        evals = np.linalg.eigvalsh(np.asarray(st.C, np.float64))
        assert evals.min() > -1e-12


class TestPreintegratedHost:
    def test_merge_equals_concat(self):
        acc, gyr, dt = make_meas(40)
        p1 = Preintegrated(np.zeros(6), NGA, NGAW)
        p1.integrate_measurements(acc[:25], gyr[:25], dt[:25])
        p2 = Preintegrated(np.zeros(6), NGA, NGAW)
        p2.integrate_measurements(acc[25:], gyr[25:], dt[25:])
        p2.merge_previous(p1)
        pall = Preintegrated(np.zeros(6), NGA, NGAW)
        pall.integrate_measurements(acc, gyr, dt)
        np.testing.assert_allclose(p2.state.dP, pall.state.dP, atol=1e-6)
        np.testing.assert_allclose(p2.state.dR, pall.state.dR, atol=1e-6)
        assert abs(p2.dT - pall.dT) < 1e-6

    def test_reintegrate_with_new_bias(self):
        acc, gyr, dt = make_meas(30)
        p = Preintegrated(np.zeros(6), NGA, NGAW)
        p.integrate_measurements(acc, gyr, dt)
        bnew = np.array([0.01, 0, 0, 0.05, 0, 0], np.float32)
        p.set_new_bias(bnew)
        p.reintegrate()
        pref = Preintegrated(bnew, NGA, NGAW)
        pref.integrate_measurements(acc, gyr, dt)
        np.testing.assert_allclose(p.state.dV, pref.state.dV, atol=1e-6)
