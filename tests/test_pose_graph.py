"""Pose-graph optimizer tests: loop-closure drift correction scenarios."""

import numpy as np

import jax.numpy as jnp

from ppg_slam_tpu.geometry import Sim3, so3
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.estimator.pose_graph import (
    Graph4DoF,
    Sim3Graph,
    optimize_essential_graph,
    optimize_essential_graph_4dof,
    optimize_sim3,
)

RNG = np.random.RandomState(31)

CAM = CameraModel(kind=CAM_PINHOLE, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                  dist=(0.0, 0.0, 0.0, 0.0), width=640, height=480)


def make_loop_trajectory(n=12):
    """Poses on a circle: Tcw per KF (camera convention for Sim3 graph)."""
    Rcw, tcw = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        Rwc = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, ang])), np.float32)
        twc = np.float32([2 * np.cos(ang), 2 * np.sin(ang), 0.0])
        Rcw.append(Rwc.T)
        tcw.append((-Rwc.T @ twc).astype(np.float32))
    return np.stack(Rcw), np.stack(tcw)


def relative_sim3(Rcw, tcw, s, i, j):
    """Sji = Sjw * Swi at given states."""
    Si = Sim3(jnp.asarray(Rcw[i]), jnp.asarray(tcw[i]),
              jnp.asarray(np.float32(s[i])))
    Sj = Sim3(jnp.asarray(Rcw[j]), jnp.asarray(tcw[j]),
              jnp.asarray(np.float32(s[j])))
    return Sj @ Si.inverse()


class TestEssentialGraph:
    def _run(self, use_4dof=False):
        n = 12
        Rcw, tcw = make_loop_trajectory(n)
        s_gt = np.ones(n, np.float32)

        # drifted states: accumulate noise along the chain (except KF0)
        Rd, td = Rcw.copy(), tcw.copy()
        sd = np.ones(n, np.float32)
        for k in range(1, n):
            if use_4dof:
                # 4-DoF graphs can only correct yaw: inject world-yaw drift
                dR = np.asarray(so3.exp(jnp.asarray(
                    np.float32([0.0, 0.0, 0.03 * RNG.randn()]))))
            else:
                dR = np.asarray(so3.exp(
                    jnp.asarray(RNG.randn(3).astype(np.float32) * 0.02)))
            Rd[k] = (Rd[k] @ dR).astype(np.float32)
            td[k] += RNG.randn(3).astype(np.float32) * 0.1
            if not use_4dof:
                sd[k] = np.float32(1.0 + 0.02 * RNG.randn())

        # edges: temporal chain with DRIFTED relative measurements (consistent
        # with the drifted states) + loop edge 0<->last with TRUE relative
        ii, jj, SR, St, Ss = [], [], [], [], []
        for k in range(n - 1):
            S = relative_sim3(Rd, td, sd, k, k + 1)
            ii.append(k)
            jj.append(k + 1)
            SR.append(np.asarray(S.R))
            St.append(np.asarray(S.t))
            Ss.append(float(S.s))
        S = relative_sim3(Rcw, tcw, s_gt, n - 1, 0)  # true loop constraint
        ii.append(n - 1)
        jj.append(0)
        SR.append(np.asarray(S.R))
        St.append(np.asarray(S.t))
        Ss.append(float(S.s))
        return (n, Rcw, tcw, Rd, td, sd,
                np.asarray(ii, np.int32), np.asarray(jj, np.int32),
                np.stack(SR).astype(np.float32), np.stack(St).astype(np.float32),
                np.asarray(Ss, np.float32))

    def test_sim3_graph_closes_loop(self):
        n, Rcw, tcw, Rd, td, sd, ii, jj, SR, St, Ss = self._run()
        graph = Sim3Graph(i=jnp.asarray(ii), j=jnp.asarray(jj),
                          Sji_R=jnp.asarray(SR), Sji_t=jnp.asarray(St),
                          Sji_s=jnp.asarray(Ss),
                          valid=jnp.ones(len(ii), bool))
        fixed = np.zeros(n, bool)
        fixed[0] = True
        Rf, tf, sf = optimize_essential_graph(
            jnp.asarray(Rd), jnp.asarray(td), jnp.asarray(sd), graph,
            jnp.asarray(fixed))
        # residual of the loop edge must be ~0 after optimization and the
        # total graph chi2 must be tiny: measure loop closure error
        S_last0 = relative_sim3(np.asarray(Rf), np.asarray(tf),
                                np.asarray(sf), n - 1, 0)
        S_gt = relative_sim3(Rcw, tcw, np.ones(n, np.float32), n - 1, 0)
        err = S_gt.inverse() @ S_last0
        assert float(jnp.linalg.norm(err.log())) < 0.02

    def test_4dof_graph_closes_loop(self):
        n, Rcw, tcw, Rd, td, sd, ii, jj, SR, St, Ss = self._run(use_4dof=True)
        # 4DoF graph uses body poses Rwb/twb; here body == camera
        Rwb = np.transpose(Rd, (0, 2, 1))
        twb = -np.einsum("nij,nj->ni", Rwb, td)
        graph = Graph4DoF(i=jnp.asarray(ii), j=jnp.asarray(jj),
                          dRij=jnp.asarray(np.transpose(SR, (0, 2, 1))),
                          # Edge4DoF wants Ti<-j = (Tj<-i)^-1 as (dRij, dtij):
                          dtij=jnp.asarray(-np.einsum(
                              "nij,nj->ni", np.transpose(SR, (0, 2, 1)), St)),
                          valid=jnp.ones(len(ii), bool))
        fixed = np.zeros(n, bool)
        fixed[0] = True
        Rf, tf = optimize_essential_graph_4dof(
            jnp.asarray(Rwb), jnp.asarray(twb), graph, jnp.asarray(fixed))
        # check loop closes: relative camera pose (n-1 -> 0) == ground truth
        Rcw_f = np.transpose(np.asarray(Rf), (0, 2, 1))
        tcw_f = -np.einsum("nij,nj->ni", Rcw_f, np.asarray(tf))
        S_last0 = relative_sim3(Rcw_f, tcw_f, np.ones(n, np.float32), n - 1, 0)
        S_gt = relative_sim3(Rcw, tcw, np.ones(n, np.float32), n - 1, 0)
        err = S_gt.inverse() @ S_last0
        assert float(jnp.linalg.norm(err.log())) < 0.02


class TestOptimizeSim3:
    def test_recovers_relative_sim3(self):
        m = 60
        X1 = np.stack([RNG.uniform(-2, 2, m), RNG.uniform(-1.5, 1.5, m),
                       RNG.uniform(4, 8, m)], 1).astype(np.float32)
        R12 = np.asarray(so3.exp(jnp.asarray([0.05, -0.1, 0.08])), np.float32)
        t12 = np.float32([0.4, -0.2, 0.3])
        s12 = np.float32(1.35)
        S12 = Sim3(jnp.asarray(R12), jnp.asarray(t12), jnp.asarray(s12))
        X2 = np.asarray(S12.inverse().apply(jnp.asarray(X1)))

        uv1 = np.array(CAM.project(jnp.asarray(X1)))
        uv2 = np.array(CAM.project(jnp.asarray(X2)))
        # outliers
        bad = RNG.choice(m, 8, replace=False)
        uv1[bad] += RNG.randn(8, 2).astype(np.float32) * 50 + 10

        # perturbed init
        dS = Sim3.exp(jnp.asarray(
            np.float32([0.05, -0.03, 0.04, 0.02, -0.01, 0.03, 0.05])))
        S0 = dS @ S12
        Rf, tf, sf, inl, n_in = optimize_sim3(
            S0.R, S0.t, S0.s, jnp.asarray(X1), jnp.asarray(X2),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(m, bool), CAM, CAM)
        np.testing.assert_allclose(np.asarray(Rf), R12, atol=2e-3)
        np.testing.assert_allclose(np.asarray(tf), t12, atol=1e-2)
        assert abs(float(sf) - s12) < 0.01
        assert int(n_in) >= m - 10
        assert not np.asarray(inl)[bad].any()
