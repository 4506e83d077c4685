"""Estimator tests: synthetic BA convergence, residual correctness, pose opt."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppg_slam_tpu.geometry import SE3, so3
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.estimator import (
    BAOptions,
    BAProblem,
    KFStates,
    empty_problem,
    solve_ba,
    pose_optimization,
    pose_inertial_optimization,
    FrameVIState,
    PreintData,
    Prior15,
    marginalize_schur,
)
from ppg_slam_tpu.estimator.ba_core import inertial_residual
from ppg_slam_tpu.imu import integrate, GRAVITY_VALUE

RNG = np.random.RandomState(17)

CAM = CameraModel(kind=CAM_PINHOLE, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                  dist=(0.0, 0.0, 0.0, 0.0), width=640, height=480)


def make_world(n_kf=6, n_mp=60):
    """Cameras on an arc looking at a point cloud in front."""
    points = np.stack([
        RNG.uniform(-2, 2, n_mp), RNG.uniform(-1.5, 1.5, n_mp),
        RNG.uniform(4, 8, n_mp)
    ], 1).astype(np.float32)
    R_list, t_list = [], []
    for k in range(n_kf):
        ang = 0.05 * (k - n_kf / 2)
        Rwb = np.asarray(so3.exp(jnp.asarray([0.0, ang, 0.0])), np.float32)
        twb = np.array([0.5 * k, 0.02 * k, 0.1 * np.sin(k)], np.float32)
        R_list.append(Rwb)
        t_list.append(twb)
    return points, np.stack(R_list), np.stack(t_list)


def project_all(points, Rwb, twb):
    """Observations for every (kf, mp): body frame == camera frame here."""
    obs = []
    for k in range(len(Rwb)):
        Xc = (points - twb[k]) @ Rwb[k]  # R^T (X - t)
        uv = np.stack([400 * Xc[:, 0] / Xc[:, 2] + 320,
                       400 * Xc[:, 1] / Xc[:, 2] + 240], 1)
        obs.append(uv.astype(np.float32))
    return np.stack(obs)  # (K, M, 2)


def build_problem(points, Rwb, twb, noise=0.0, coline_idx=None):
    n_kf, n_mp = len(Rwb), len(points)
    uv = project_all(points, Rwb, twb)
    uv += RNG.randn(*uv.shape).astype(np.float32) * noise
    r_kf = np.repeat(np.arange(n_kf), n_mp).astype(np.int32)
    r_mp = np.tile(np.arange(n_mp), n_kf).astype(np.int32)
    r_uv = uv.reshape(-1, 2)
    O = len(r_kf)
    base = empty_problem(n_obs=O, n_col=max(1, 0 if coline_idx is None else len(coline_idx)),
                         n_links=1, n_priors=1, n_bp=1)
    prob = base._replace(
        r_kf=jnp.asarray(r_kf), r_mp=jnp.asarray(r_mp),
        r_uv=jnp.asarray(r_uv), r_valid=jnp.ones(O, bool),
    )
    if coline_idx is not None:
        prob = prob._replace(
            c_idx=jnp.asarray(np.asarray(coline_idx, np.int32)),
            c_w=jnp.full((len(coline_idx),), 50.0, jnp.float32),
            c_valid=jnp.ones(len(coline_idx), bool),
        )
    return prob


class TestVisualBA:
    def test_converges_to_ground_truth(self):
        points, Rwb, twb = make_world()
        n_kf, n_mp = len(Rwb), len(points)
        prob = build_problem(points, Rwb, twb)

        # perturb everything except the first two poses (gauge)
        Rn = Rwb.copy()
        tn = twb.copy()
        for k in range(2, n_kf):
            Rn[k] = np.asarray(
                so3.exp(jnp.asarray(RNG.randn(3).astype(np.float32) * 0.02))
            ) @ Rn[k]
            tn[k] += RNG.randn(3).astype(np.float32) * 0.05
        pn = points + RNG.randn(n_mp, 3).astype(np.float32) * 0.05

        states = KFStates(
            R=jnp.asarray(Rn), t=jnp.asarray(tn),
            v=jnp.zeros((n_kf, 3), jnp.float32),
            bg=jnp.zeros((n_kf, 3), jnp.float32),
            ba=jnp.zeros((n_kf, 3), jnp.float32))
        kf_dof = np.zeros((n_kf, 15), bool)
        kf_dof[2:, :6] = True  # first two fixed
        opts = BAOptions(iters=15, lambda0=1e-5)
        st, pts, info = solve_ba(
            states, jnp.asarray(pn), prob, jnp.asarray(kf_dof),
            jnp.ones(n_mp, bool), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), CAM, opts)

        np.testing.assert_allclose(np.asarray(st.t), twb, atol=2e-3)
        np.testing.assert_allclose(np.asarray(pts), points, atol=5e-3)
        chi2 = np.asarray(info["chi2_hist"])
        assert chi2[-1] < chi2[0] * 1e-4

    def test_coline_constraint_pulls_points_to_line(self):
        """3 collinear points, perturb middle one off the line, only colines +
        2 fixed cameras observing: coline residual must decrease."""
        points, Rwb, twb = make_world(n_kf=2, n_mp=9)
        # make points 0,1,2 collinear
        points[1] = 0.5 * (points[0] + points[2])
        prob = build_problem(points, Rwb, twb, coline_idx=[[0, 1, 2]])
        pn = points.copy()
        pn[1] += np.float32([0.05, -0.04, 0.06])

        states = KFStates(R=jnp.asarray(Rwb), t=jnp.asarray(twb),
                          v=jnp.zeros((2, 3), jnp.float32),
                          bg=jnp.zeros((2, 3), jnp.float32),
                          ba=jnp.zeros((2, 3), jnp.float32))
        kf_dof = np.zeros((2, 15), bool)  # all poses fixed
        opts = BAOptions(iters=10, lambda0=1e-4)
        st, pts, info = solve_ba(
            states, jnp.asarray(pn), prob, jnp.asarray(kf_dof),
            jnp.ones(9, bool), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), CAM, opts)
        np.testing.assert_allclose(np.asarray(pts), points, atol=2e-3)

    def test_robust_kernel_rejects_outliers(self):
        points, Rwb, twb = make_world()
        prob = build_problem(points, Rwb, twb)
        uv = np.asarray(prob.r_uv).copy()
        bad = RNG.choice(len(uv), 20, replace=False)
        uv[bad] += RNG.randn(20, 2).astype(np.float32) * 80.0
        prob = prob._replace(r_uv=jnp.asarray(uv))
        n_kf, n_mp = len(Rwb), len(points)
        tn = twb.copy()
        tn[2:] += RNG.randn(len(twb) - 2, 3).astype(np.float32) * 0.03
        states = KFStates(R=jnp.asarray(Rwb), t=jnp.asarray(tn),
                          v=jnp.zeros((n_kf, 3), jnp.float32),
                          bg=jnp.zeros((n_kf, 3), jnp.float32),
                          ba=jnp.zeros((n_kf, 3), jnp.float32))
        kf_dof = np.zeros((n_kf, 15), bool)
        kf_dof[2:, :6] = True
        opts = BAOptions(iters=15, lambda0=1e-5)
        st, pts, info = solve_ba(
            states, jnp.asarray(points), prob, jnp.asarray(kf_dof),
            jnp.ones(n_mp, bool), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), CAM, opts)
        np.testing.assert_allclose(np.asarray(st.t), twb, atol=5e-3)
        # outliers should have big chi2, inliers small
        chi2 = np.asarray(info["obs_chi2"])
        inl = np.ones(len(uv), bool)
        inl[bad] = False
        assert np.median(chi2[inl]) < 1.0


class TestInertialResidual:
    def test_zero_on_consistent_states(self):
        """States integrated exactly from the preintegration => residual 0."""
        n = 40
        acc_w = np.tile(np.float32([0.3, -0.2, 0.1]), (n, 1))  # world acc
        gyr = np.tile(np.float32([0.02, 0.05, -0.03]), (n, 1))
        dt = np.full(n, 0.005, np.float32)
        g = np.float32([0, 0, -GRAVITY_VALUE])

        # simulate true motion (body frame measurements)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        v = np.float32([0.1, 0.2, 0.0])
        accs = []
        R0, t0, v0 = R.copy(), t.copy(), v.copy()
        for k in range(n):
            a_body = (R.T @ (acc_w[k] - g)).astype(np.float32)
            accs.append(a_body)
            t = t + v * dt[k] + 0.5 * acc_w[k] * dt[k] ** 2
            v = v + acc_w[k] * dt[k]
            R = R @ np.asarray(so3.exp(jnp.asarray(gyr[k] * dt[k])),
                               np.float32)
        accs = np.stack(accs)

        nga = np.full(6, 1e-6, np.float32)
        st = integrate(jnp.asarray(accs), jnp.asarray(gyr), jnp.asarray(dt),
                       jnp.ones(n, bool), jnp.zeros(6, jnp.float32), nga, nga)
        z = jnp.zeros(15, jnp.float32)
        r = inertial_residual(
            z, z, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(v0),
            jnp.zeros(3), jnp.zeros(3), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(v), st.dR, st.dV, st.dP, st.JRg, st.JVg, st.JVa,
            st.JPg, st.JPa, jnp.zeros(6, jnp.float32),
            jnp.asarray(float(st.dT), jnp.float32))
        assert float(jnp.abs(r).max()) < 1e-3


class TestPoseOpt:
    def test_pose_optimization_recovers_pose(self):
        points, Rwb, twb = make_world(n_kf=1, n_mp=80)
        Rcw = Rwb[0].T
        tcw = -Rcw @ twb[0]
        uv = project_all(points, Rwb, twb)[0]
        # outliers
        uv_n = uv.copy()
        bad = RNG.choice(80, 12, replace=False)
        uv_n[bad] += RNG.randn(12, 2).astype(np.float32) * 60 + 20

        # perturb initial pose
        dR = np.asarray(so3.exp(jnp.asarray(np.float32([0.02, -0.01, 0.03]))))
        R0 = (dR @ Rcw).astype(np.float32)
        t0 = tcw + np.float32([0.05, -0.03, 0.08])

        Rf, tf, inlier, n_in = pose_optimization(
            jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(points),
            jnp.asarray(uv_n), jnp.ones(80, bool), CAM)
        np.testing.assert_allclose(np.asarray(tf), tcw, atol=2e-3)
        np.testing.assert_allclose(np.asarray(Rf), Rcw, atol=1e-3)
        inl = np.asarray(inlier)
        assert not inl[bad].any() or inl[bad].sum() <= 2
        assert int(n_in) >= 60

    def test_pose_inertial_optimization(self):
        points, Rwb, twb = make_world(n_kf=2, n_mp=60)
        uv = project_all(points, Rwb, twb)[1]

        # simulate body motion with the SAME discrete model the
        # preintegration assumes, ending exactly at twb[1]
        n = 20
        dtm = np.full(n, 0.005, np.float32)
        g = np.float32([0, 0, -GRAVITY_VALUE])
        dT = float(dtm.sum())
        vel0 = np.float32([0.3, -0.1, 0.2])
        a_total = (2.0 * (twb[1] - twb[0] - vel0 * dT) / dT**2).astype(
            np.float32)  # constant total world acceleration (incl. gravity)
        accs, gyrs = [], []
        R = Rwb[0].copy()
        t = twb[0].copy()
        v = vel0.copy()
        wb = np.asarray(so3.log(jnp.asarray(Rwb[0].T @ Rwb[1])),
                        np.float32) / dT
        for k in range(n):
            accs.append((R.T @ (a_total - g)).astype(np.float32))
            gyrs.append(wb.astype(np.float32))
            t = t + v * dtm[k] + 0.5 * a_total * dtm[k] ** 2
            v = v + a_total * dtm[k]
            R = R @ np.asarray(so3.exp(jnp.asarray(wb * dtm[k])), np.float32)
        t1_gt, vel1 = t.copy(), v.copy()
        # t1_gt differs from twb[1] only by discretization (tiny)
        np.testing.assert_allclose(t1_gt, twb[1], atol=1e-3)
        st = integrate(jnp.asarray(np.stack(accs)), jnp.asarray(np.stack(gyrs)),
                       jnp.asarray(dtm), jnp.ones(n, bool),
                       jnp.zeros(6, jnp.float32),
                       jnp.full(6, 1e-5, jnp.float32), jnp.full(6, 1e-8, jnp.float32))

        preint = PreintData(
            dR=st.dR, dV=st.dV, dP=st.dP, JRg=st.JRg, JVg=st.JVg,
            JVa=st.JVa, JPg=st.JPg, JPa=st.JPa, b0=jnp.zeros(6, jnp.float32),
            sqi=jnp.eye(9, dtype=jnp.float32) * 50.0,
            sqig=jnp.eye(3, dtype=jnp.float32) * 100.0,
            sqia=jnp.eye(3, dtype=jnp.float32) * 100.0,
            dt=jnp.asarray(dT, jnp.float32))
        prior = Prior15(R=jnp.asarray(Rwb[0]), t=jnp.asarray(twb[0]),
                        v=jnp.asarray(vel0), bg=jnp.zeros(3, jnp.float32),
                        ba=jnp.zeros(3, jnp.float32),
                        H=jnp.eye(15, dtype=jnp.float32) * 1e4,
                        valid=jnp.asarray(True))
        prev = FrameVIState(R=jnp.asarray(Rwb[0]), t=jnp.asarray(twb[0]),
                            v=jnp.asarray(vel0), bg=jnp.zeros(3, jnp.float32),
                            ba=jnp.zeros(3, jnp.float32))
        # perturbed current state
        dR = np.asarray(so3.exp(jnp.asarray(np.float32([0.01, 0.02, -0.01]))))
        curr = FrameVIState(
            R=jnp.asarray((Rwb[1] @ dR).astype(np.float32)),
            t=jnp.asarray(twb[1] + np.float32([0.04, -0.02, 0.05])),
            v=jnp.asarray(vel1 + np.float32([0.1, 0, -0.1])),
            bg=jnp.zeros(3, jnp.float32), ba=jnp.zeros(3, jnp.float32))

        c, inlier, n_in, new_prior = pose_inertial_optimization(
            curr, prev, preint, prior, jnp.asarray(points), jnp.asarray(uv),
            jnp.ones(60, bool), jnp.zeros(60, bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            CAM)
        np.testing.assert_allclose(np.asarray(c.t), twb[1], atol=5e-3)
        np.testing.assert_allclose(np.asarray(c.v), vel1, atol=5e-2)
        assert int(n_in) >= 55
        assert bool(new_prior.valid)
        evals = np.linalg.eigvalsh(np.asarray(new_prior.H, np.float64))
        assert evals.min() > -1e-3


class TestMarginalize:
    def test_schur_identity(self):
        A = RNG.randn(30, 30).astype(np.float64)
        H = A @ A.T
        Hm = np.asarray(marginalize_schur(jnp.asarray(H), 15))
        # ground truth dense Schur
        ref = H[15:, 15:] - H[15:, :15] @ np.linalg.inv(H[:15, :15]) @ H[:15, 15:]
        np.testing.assert_allclose(Hm, ref, atol=1e-6 * np.abs(ref).max())


@pytest.mark.slow
class TestOneProgramPerBucket:
    # Slow lane: a compile-count regression guard (~12 s of deliberate
    # recompiles); the property it guards is exercised implicitly by the
    # default lane's total wall time staying inside the CI window.
    def test_flavors_and_cameras_share_one_compiled_program(self):
        """BAOptions and CameraModel are pytrees of runtime leaves (r2): the
        LBA/GBA/FIBA robust-kernel flavors, damping schedules and camera
        calibrations must all execute through ONE compiled solve program per
        shape bucket. Guards the refactor that removed the ~12 s per-flavor
        XLA compile (estimator/ba_core.py BAOptions registration)."""
        points, Rwb, twb = make_world(n_kf=4, n_mp=24)
        n_kf, n_mp = len(Rwb), len(points)
        prob = build_problem(points, Rwb, twb, noise=0.3)
        states = KFStates(
            R=jnp.asarray(Rwb), t=jnp.asarray(twb),
            v=jnp.zeros((n_kf, 3), jnp.float32),
            bg=jnp.zeros((n_kf, 3), jnp.float32),
            ba=jnp.zeros((n_kf, 3), jnp.float32))
        kf_dof = np.zeros((n_kf, 15), bool)
        kf_dof[2:, :6] = True
        args = (states, jnp.asarray(points), prob, jnp.asarray(kf_dof),
                jnp.ones(n_mp, bool), jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, jnp.float32))

        compiles = [0]

        def count(key, *a, **kw):
            if key == "/jax/core/compile/backend_compile_duration":
                compiles[0] += 1

        jax.monitoring.register_event_duration_secs_listener(count)
        # first solve may compile (or reuse an earlier module's program)
        solve_ba(*args, CAM, BAOptions(iters=3, lambda0=1e-5))
        compiles[0] = 0
        # every reference flavor (OptimizerLBA/GBA/Pose lambda0 + kernels,
        # SURVEY 2.4) and a different calibration: zero new programs
        cam2 = CameraModel(kind=CAM_PINHOLE, fx=458.654, fy=457.296,
                           cx=367.215, cy=248.375, dist=(0.0, 0.0, 0.0, 0.0),
                           width=640, height=480)
        for cam, opts in (
            (CAM, BAOptions(iters=5, lambda0=100.0, reproj_kernel="cauchy")),
            (CAM, BAOptions(iters=4, lambda0=1e-2, reproj_kernel="huber",
                            tol=1e-3)),
            (CAM, BAOptions(iters=2, lambda0=1.0, reproj_kernel="none",
                            coline_kernel="huber", coline_delta=2.795)),
            (cam2, BAOptions(iters=3, lambda0=1e-5)),
        ):
            st, pts, info = solve_ba(*args, cam, opts)
            assert np.isfinite(float(np.asarray(info["final_chi2"])))
        assert compiles[0] == 0, (
            f"{compiles[0]} recompiles — BAOptions/CameraModel leaves must "
            f"stay runtime pytree data, not program constants")


class TestAnalyticReprojection:
    @pytest.mark.parametrize("kind,dist", [
        (CAM_PINHOLE, (0.0, 0.0, 0.0, 0.0)),
        (1, (0.003, 0.0007, -0.002, 0.0002)),  # CAM_FISHEYE / KB8
    ])
    def test_matches_jacfwd(self, kind, dist):
        """_reproj_batch (the analytic batched linearization used on the
        hot path — per-obs vmapped jacfwd lowers to ms-scale convolution
        fusions on TPU) equals jacfwd of make_reproj_residual at delta=0."""
        from ppg_slam_tpu.estimator.ba_core import (_reproj_batch,
                                                    make_reproj_residual)

        rng = np.random.RandomState(0)
        cam = CameraModel(kind=kind, fx=200.0, fy=210.0, cx=64.0, cy=48.0,
                          dist=dist, width=128, height=96)
        O = 40
        Rg = jnp.stack([so3.exp(jnp.asarray(rng.randn(3) * 0.2,
                                            jnp.float32))
                        for _ in range(O)])
        tg = jnp.asarray(rng.randn(O, 3), jnp.float32)
        Xg = jnp.asarray(rng.randn(O, 3) * [2, 2, 1] + [0, 0, 6],
                         jnp.float32)
        uv = jnp.asarray(rng.rand(O, 2) * 100, jnp.float32)
        Rcb = so3.exp(jnp.asarray([0.05, -0.02, 0.1], jnp.float32))
        tcb = jnp.asarray([0.01, -0.02, 0.03], jnp.float32)
        res_fn = make_reproj_residual(cam, Rcb, tcb)

        def one(R, t, X, u):
            z6 = jnp.zeros(6, jnp.float32)
            z3 = jnp.zeros(3, jnp.float32)
            r = res_fn(z6, z3, R, t, X, u)
            Jk, Jx = jax.jacfwd(res_fn, argnums=(0, 1))(z6, z3, R, t, X, u)
            return r, Jk, Jx

        r0, Jk0, Jx0 = jax.vmap(one)(Rg, tg, Xg, uv)
        r1, depth, Jk1, Jx1 = _reproj_batch(cam, Rcb, tcb, Rg, tg, Xg, uv,
                                            want_jac=True)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Jk1), np.asarray(Jk0),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Jx1), np.asarray(Jx0),
                                   rtol=1e-4, atol=1e-3)
        assert np.all(np.asarray(depth) > 0)

    def test_pose_cg_matches_cholesky(self):
        """The diagonal-preconditioned CG pose solve (accelerator default)
        equals the dense Cholesky through a full VI solve."""
        from ppg_slam_tpu.parallel import make_vi_problem

        cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
            n_kf=5, n_mp=48, n_obs=160, n_col=12, seed=1)
        eye = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        a = (states, points, prob, kf_dof, mp_free, eye, z3, cam)
        o_ch = BAOptions(iters=4, lambda0=1e-2, tol=0.0, pose_cg_iters=0)
        # 64 = the accelerator DEFAULT iteration count, and the same
        # static-aux value as the ill-scaled-window test below — the two
        # tests share one compiled program pair instead of paying a third
        # ~20 s pose_cg=80 XLA:CPU compile
        o_cg = BAOptions(iters=4, lambda0=1e-2, tol=0.0, pose_cg_iters=64)
        s1, p1, i1 = solve_ba(*a, o_ch)
        s2, p2, i2 = solve_ba(*a, o_cg)
        np.testing.assert_allclose(np.asarray(s2.t), np.asarray(s1.t),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(float(i2["final_chi2"]),
                                   float(i1["final_chi2"]), rtol=1e-3)

    def test_backtracking_accept_covered(self):
        """BAOptions.backtrack resolves ON for accelerators but OFF on the
        CPU test backend (compile-budget; see the field docstring) — force
        it ON here so the accelerator default has CPU coverage. The
        backtrack branch engages only on rejected steps, so on the same
        problem it must do at least as well as the plain accept."""
        from ppg_slam_tpu.parallel import make_vi_problem

        cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
            n_kf=5, n_mp=48, n_obs=160, n_col=12, seed=1)
        eye = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        a = (states, points, prob, kf_dof, mp_free, eye, z3, cam)
        o_bt = BAOptions(iters=6, lambda0=1e-2, tol=0.0, pose_cg_iters=0,
                         backtrack=True)
        o_pl = BAOptions(iters=6, lambda0=1e-2, tol=0.0, pose_cg_iters=0,
                         backtrack=False)
        _, _, i_bt = solve_ba(*a, o_bt)
        _, _, i_pl = solve_ba(*a, o_pl)
        h_bt = np.asarray(i_bt["chi2_hist"])
        assert float(i_bt["final_chi2"]) < h_bt[0] * 0.9, "no descent"
        assert float(i_bt["final_chi2"]) <= \
            float(i_pl["final_chi2"]) * 1.05, (
                "backtracking accept did worse than the plain accept")

    def test_pose_cg_default_iters_on_inertial_window(self):
        """ADVICE r3 (medium): the accelerator default PCG(64) must match
        Cholesky on a realistic ILL-SCALED problem — a LIBA-window-class
        visual-inertial solve whose whitened preintegration blocks sit
        orders of magnitude above the vision blocks (the spectrum mix the
        small well-conditioned 5-KF fixture above never exercises)."""
        from ppg_slam_tpu.parallel import make_vi_problem

        cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
            n_kf=24, n_mp=256, n_obs=1024, n_col=64, seed=7)
        eye = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        a = (states, points, prob, kf_dof, mp_free, eye, z3, cam)
        o_ch = BAOptions(iters=4, lambda0=1e-2, tol=0.0, pose_cg_iters=0)
        o_cg = BAOptions(iters=4, lambda0=1e-2, tol=0.0, pose_cg_iters=64)
        s1, p1, i1 = solve_ba(*a, o_ch)
        s2, p2, i2 = solve_ba(*a, o_cg)
        # chi2 agreement is the accuracy-relevant contract (trajectories
        # may differ along near-null directions the cost cannot see)
        np.testing.assert_allclose(float(i2["final_chi2"]),
                                   float(i1["final_chi2"]), rtol=5e-3)
        np.testing.assert_allclose(np.asarray(s2.t), np.asarray(s1.t),
                                   rtol=5e-3, atol=1e-2)


class TestAssemblyPathEquivalence:
    def test_onehot_matches_scatter_assembly(self, monkeypatch):
        """The accelerator (one-hot MXU matmul) and CPU (scatter-add)
        assemblies must build the same normal equations — including the
        pose-only (N*6) W cross-block layout. Summation order differs, so
        compare to float tolerance."""
        from ppg_slam_tpu.estimator.ba_core import _compute_all
        from ppg_slam_tpu.parallel import make_vi_problem

        cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
            n_kf=5, n_mp=48, n_obs=160, n_col=12, seed=3)
        eye = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        opts = BAOptions(iters=1, lambda0=1e-2)

        def run():
            # fresh jit per env setting (the assembly path is chosen at
            # trace time); jitted: the eager graph costs ~40 s of tiny
            # per-op CPU compiles, one jit compile ~5 s
            f = jax.jit(lambda st, pts: _compute_all(
                st, pts, prob, cam, eye, z3, opts, kf_dof, mp_free)[:7])
            return jax.device_get(f(states, points))

        monkeypatch.setenv("PPG_FORCE_ONEHOT", "0")
        chi_s, Hpp_s, bp_s, Hll_s, Hlc_s, bl_s, W_s = run()
        monkeypatch.setenv("PPG_FORCE_ONEHOT", "1")
        chi_o, Hpp_o, bp_o, Hll_o, Hlc_o, bl_o, W_o = run()

        assert W_s.shape == (48, 3, 5 * 6)
        np.testing.assert_allclose(chi_o, chi_s, rtol=1e-5)
        np.testing.assert_allclose(Hpp_o, Hpp_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(bp_o, bp_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Hll_o, Hll_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Hlc_o, Hlc_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(bl_o, bl_s, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(W_o, W_s, rtol=1e-4, atol=1e-4)

    def _slot_problem(self, n_kf=6, n_mp=40, K=4, tail=5, seed=0):
        """Hand-built slot-major problem (obs row = mp*K + rank, overflow
        tail) with the ba_core layout contract r_mp[o] == o//K."""
        rng = np.random.RandomState(seed)
        pts = np.stack([rng.uniform(-3, 3, n_mp), rng.uniform(-2, 2, n_mp),
                        rng.uniform(4, 10, n_mp)], 1).astype(np.float32)
        Rwb = np.broadcast_to(np.eye(3, dtype=np.float32),
                              (n_kf, 3, 3)).copy()
        twb = np.zeros((n_kf, 3), np.float32)
        twb[:, 0] = np.linspace(0, 1, n_kf)
        MK = n_mp * K
        r_kf = np.zeros(MK + tail, np.int32)
        r_mp = np.zeros(MK + tail, np.int32)
        r_valid = np.zeros(MK + tail, bool)
        r_mp[:MK] = np.arange(MK) // K
        for m in range(n_mp):
            for a, k in enumerate(rng.choice(n_kf, rng.randint(2, K + 1),
                                             replace=False)):
                r_kf[m * K + a] = k
                r_valid[m * K + a] = True
        for t in range(tail):
            r_mp[MK + t] = rng.randint(0, n_mp)
            r_kf[MK + t] = rng.randint(0, n_kf)
            r_valid[MK + t] = True
        Xc = np.einsum("oij,oj->oi", Rwb[r_kf].transpose(0, 2, 1),
                       pts[r_mp] - twb[r_kf])
        uv = np.stack([CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx,
                       CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy], 1)
        uv += rng.randn(*uv.shape) * 0.3
        c_idx = rng.randint(0, n_mp, (6, 3)).astype(np.int32)
        prob = empty_problem(n_obs=MK + tail, n_col=6, n_links=1,
                             n_priors=1, n_bp=1)
        prob = prob._replace(
            r_kf=jnp.asarray(r_kf), r_mp=jnp.asarray(r_mp),
            r_uv=jnp.asarray(uv.astype(np.float32)),
            r_valid=jnp.asarray(r_valid), c_idx=jnp.asarray(c_idx),
            c_w=jnp.full((6,), 20.0, jnp.float32),
            c_valid=jnp.ones(6, bool))
        tn = twb + rng.randn(n_kf, 3).astype(np.float32) * 0.02
        tn[0] = twb[0]
        pn = pts + rng.randn(n_mp, 3).astype(np.float32) * 0.02
        states = KFStates(jnp.asarray(Rwb), jnp.asarray(tn),
                          jnp.zeros((n_kf, 3), jnp.float32),
                          jnp.zeros((n_kf, 3), jnp.float32),
                          jnp.zeros((n_kf, 3), jnp.float32))
        kf_dof = np.zeros((n_kf, 15), bool)
        kf_dof[1:, :6] = True
        return (states, jnp.asarray(pn), prob, jnp.asarray(kf_dof),
                jnp.ones(n_mp, bool), jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, jnp.float32), CAM)

    def test_slot_assembly_matches_flat(self, monkeypatch):
        """slot_k>0 (slot-major W/Hll assembly incl. the overflow tail —
        the large-bucket scaling path) builds the same normal equations as
        the flat layout on the one-hot (production TPU) path. Jitted
        _compute_all comparison: the full-solve variants live in the slow
        lane (each odd-shape solve program costs a ~15 s CPU compile)."""
        from ppg_slam_tpu.estimator.ba_core import _compute_all

        monkeypatch.setenv("PPG_FORCE_ONEHOT", "1")
        args = self._slot_problem(n_mp=40)
        states, points, prob, kf_dof, mp_free, eye, z3, cam = args
        opts = BAOptions(iters=1, lambda0=1e-2)

        def run(slot_k):
            f = jax.jit(lambda st, pts: _compute_all(
                st, pts, prob, cam, eye, z3, opts, kf_dof.astype(bool),
                mp_free.astype(bool), slot_k=slot_k)[:7])
            return jax.device_get(f(states, points))

        chi_f, Hpp_f, bp_f, Hll_f, Hlc_f, bl_f, W_f = run(0)
        chi_s, Hpp_s, bp_s, Hll_s, Hlc_s, bl_s, W_s = run(4)
        np.testing.assert_allclose(chi_s, chi_f, rtol=1e-5)
        np.testing.assert_allclose(Hpp_s, Hpp_f, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(bp_s, bp_f, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Hll_s, Hll_f, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Hlc_s, Hlc_f, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(bl_s, bl_f, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(W_s, W_f, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    @pytest.mark.parametrize("force_onehot,n_mp", [("1", 44), ("0", 40)])
    def test_slot_solver_matches_flat(self, monkeypatch, force_onehot, n_mp):
        """slot_k>0 must match the flat layout through a full damped-GN
        run, on both the scatter and one-hot assemblies (slow lane: the
        default lane covers the normal-equation equality above and the
        assembler roundtrip below). Distinct n_mp per case so each traces
        fresh programs (the jit cache ignores the env var)."""
        monkeypatch.setenv("PPG_FORCE_ONEHOT", force_onehot)
        args = self._slot_problem(n_mp=n_mp)
        opts = BAOptions(iters=6, lambda0=1e-2, tol=0.0)
        st_f, pts_f, info_f = solve_ba(*args, opts, slot_k=0)
        st_s, pts_s, info_s = solve_ba(*args, opts, slot_k=4)
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_f),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(st_s.t), np.asarray(st_f.t),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(info_s["obs_chi2"]),
                                   np.asarray(info_f["obs_chi2"]),
                                   rtol=1e-2, atol=1e-2)

    @pytest.mark.slow
    def test_implicit_schur_matches_dense(self, monkeypatch):
        """The implicit Schur path (kfm=...) must match the dense-W fold
        through a full damped-GN run: same reduced system S, evaluated
        matrix-free (O(obs) matvecs) instead of via the O(M*(N6)^2) fold.
        Production gates it on large KF buckets (ba._implicit_min_n);
        this covers the operator equality at CPU-test size."""
        monkeypatch.setenv("PPG_FORCE_ONEHOT", "1")
        from ppg_slam_tpu.estimator.ba import _kfm_layout

        args = self._slot_problem(n_mp=42)
        states, points, prob, kf_dof, mp_free, eye, z3, cam = args
        opts = BAOptions(iters=6, lambda0=1e-2, tol=0.0, pose_cg_iters=64)
        st_d, pts_d, info_d = solve_ba(*args, opts, slot_k=4)
        perm, mask = _kfm_layout(np.asarray(prob.r_kf),
                                 np.asarray(prob.r_valid),
                                 int(states.R.shape[0]))
        st_i, pts_i, info_i = solve_ba(
            *args, opts, slot_k=4,
            kfm=(jnp.asarray(perm), jnp.asarray(mask)))
        np.testing.assert_allclose(np.asarray(pts_i), np.asarray(pts_d),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(st_i.t), np.asarray(st_d.t),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(info_i["final_chi2"]),
                                   np.asarray(info_d["final_chi2"]),
                                   rtol=1e-3)

    def test_kfm_layout_invariants(self):
        """_kfm_layout: every valid observation lands in exactly one slot
        of its own keyframe's band; masked slots are dead."""
        from ppg_slam_tpu.estimator.ba import _kfm_layout

        r_kf = np.asarray([2, 0, 2, 1, 2, 0, 3, 2], np.int32)
        r_valid = np.asarray([1, 1, 1, 1, 0, 1, 1, 1], bool)
        N = 4
        perm, mask = _kfm_layout(r_kf, r_valid, N)
        S = len(perm) // N
        assert S >= 4  # max count (kf 2 has 3 valid obs) -> pow2 floor
        live = mask > 0
        assert int(live.sum()) == int(r_valid.sum())
        # each live slot points at a valid obs of the slot's keyframe
        slots = np.nonzero(live)[0]
        for s in slots:
            o = perm[s]
            assert r_valid[o]
            assert r_kf[o] == s // S
        # bijective over valid obs
        assert len(set(perm[slots].tolist())) == len(slots)

    def test_slot_layout_assignment(self):
        """_slot_layout: bijective rows, first K per landmark slot-major,
        overflow appended as a flat tail."""
        from ppg_slam_tpu.estimator.ba import _slot_layout

        r_mp = np.asarray([3, 0, 3, 3, 1, 3, 3, 0], np.int32)
        rows, K, n_tail = _slot_layout(r_mp, M=5)
        assert K == 8 and n_tail == 0  # next pow2 >= max count (5)
        assert len(set(rows.tolist())) == len(rows)
        # first-come slot ranks within each landmark
        assert rows[1] == 0 * K + 0 and rows[7] == 0 * K + 1
        assert rows[4] == 1 * K + 0
        assert sorted(rows[[0, 2, 3, 5, 6]].tolist()) == [
            3 * K, 3 * K + 1, 3 * K + 2, 3 * K + 3, 3 * K + 4]
        for i, r in enumerate(rows):
            assert r_mp[i] == r // K

        # overflow past the K=32 cap goes to the flat tail
        r_mp2 = np.concatenate([np.full(40, 1), [0, 2]]).astype(np.int32)
        rows2, K2, n_tail2 = _slot_layout(r_mp2, M=3)
        assert K2 == 32 and n_tail2 == 8
        assert len(set(rows2.tolist())) == len(rows2)
        assert (rows2 >= 3 * K2).sum() == 8
        for i, r in enumerate(rows2):
            if r < 3 * K2:
                assert r_mp2[i] == r // K2

    def test_pad_problem_slots_roundtrip(self, monkeypatch):
        """_pad_problem(PPG_SLOTS=1) builds the ba_core slot contract and
        _padded_solve(slot_k) matches the flat path end-to-end."""
        from ppg_slam_tpu.estimator.ba import (_bucket_nm, _pad_problem,
                                               _padded_solve)
        from ppg_slam_tpu.worldmap.frame import Rig

        rng = np.random.RandomState(5)
        n_kf, n_mp, n_obs = 6, 40, 220
        pts = np.stack([rng.uniform(-3, 3, n_mp), rng.uniform(-2, 2, n_mp),
                        rng.uniform(4, 10, n_mp)], 1).astype(np.float32)
        Rwb = np.broadcast_to(np.eye(3, dtype=np.float32),
                              (n_kf, 3, 3)).copy()
        twb = np.zeros((n_kf, 3), np.float32)
        twb[:, 0] = np.linspace(0, 1, n_kf)
        r_kf = rng.randint(0, n_kf, n_obs).astype(np.int32)
        r_mp = rng.randint(0, n_mp, n_obs).astype(np.int32)
        Xc = np.einsum("oij,oj->oi", Rwb[r_kf].transpose(0, 2, 1),
                       pts[r_mp] - twb[r_kf])
        r_uv = np.stack([CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx,
                         CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy],
                        1).astype(np.float32)
        c_idx = np.zeros((0, 3), np.int32)
        c_w = np.zeros(0, np.float32)

        monkeypatch.setenv("PPG_SLOTS", "1")
        prob_s, slot_k, obs_pos = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w,
                                               n_mp=n_mp)
        M = _bucket_nm(1, n_mp)[1]
        assert slot_k > 0
        mk = M * slot_k
        rmp = np.asarray(prob_s.r_mp)
        np.testing.assert_array_equal(rmp[:mk],
                                      np.arange(mk, dtype=np.int64)
                                      // slot_k)
        np.testing.assert_array_equal(np.asarray(prob_s.r_uv)[obs_pos],
                                      r_uv)
        assert np.asarray(prob_s.r_valid).sum() == n_obs

        monkeypatch.setenv("PPG_SLOTS", "0")
        prob_f, zk, pos_f = _pad_problem(r_kf, r_mp, r_uv, c_idx, c_w,
                                         n_mp=n_mp)
        assert zk == 0 and np.array_equal(pos_f, np.arange(n_obs))

        states = KFStates(Rwb, twb + rng.randn(n_kf, 3).astype(
            np.float32) * 0.02, np.zeros((n_kf, 3), np.float32),
            np.zeros((n_kf, 3), np.float32), np.zeros((n_kf, 3), np.float32))
        kf_dof = np.zeros((n_kf, 15), bool)
        kf_dof[1:, :6] = True
        rig = Rig(CAM)
        opts = BAOptions(iters=5, lambda0=1e-2, tol=0.0)
        pn = pts + rng.randn(n_mp, 3).astype(np.float32) * 0.02
        st_s, pts_out_s, info_s = _padded_solve(
            states, pn.copy(), prob_s, kf_dof.copy(),
            np.ones(n_mp, bool), rig, opts, slot_k=slot_k)
        st_f, pts_out_f, info_f = _padded_solve(
            states, pn.copy(), prob_f, kf_dof.copy(),
            np.ones(n_mp, bool), rig, opts, slot_k=0)
        np.testing.assert_allclose(np.asarray(pts_out_s)[:n_mp],
                                   np.asarray(pts_out_f)[:n_mp],
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(info_s["obs_chi2"])[obs_pos],
            np.asarray(info_f["obs_chi2"])[:n_obs], rtol=1e-2, atol=1e-2)

    @pytest.mark.slow
    def test_solve_ba_same_result_both_paths(self, monkeypatch):
        """End-to-end: a short damped-GN run converges to the same states
        through either assembly path (slow lane: the un-jitted eager solve
        costs ~25 s on the 1-core host; the normal-equation equality test
        above covers the core guarantee in the default lane)."""
        from ppg_slam_tpu.parallel import make_vi_problem

        cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
            n_kf=5, n_mp=48, n_obs=160, n_col=12, seed=4)
        eye = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        opts = BAOptions(iters=3, lambda0=1e-2)

        def run():
            st, pts, info = solve_ba(states, points, prob, kf_dof, mp_free,
                                     eye, z3, cam, opts)
            return jax.device_get((st.t, pts, info["final_chi2"]))

        # solve_ba is called UN-jitted here, so _use_onehot is re-read on
        # every trace — no cache clearing needed (clear_caches would wreck
        # the suite's cross-module program sharing, conftest.py)
        monkeypatch.setenv("PPG_FORCE_ONEHOT", "0")
        t_s, p_s, c_s = run()
        monkeypatch.setenv("PPG_FORCE_ONEHOT", "1")
        t_o, p_o, c_o = run()
        # summation order differs between the two assemblies; over 3 GN
        # iterations the drift amplifies to ~2e-4 on landmark positions
        np.testing.assert_allclose(t_o, t_s, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(p_o, p_s, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(c_o, c_s, rtol=1e-3)
