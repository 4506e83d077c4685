"""Matching + worldmap tests on the synthetic scene."""

import numpy as np
import pytest

from synthetic_world import CAM, SyntheticScene

from ppg_slam_tpu.matching import Matcher, PnPSolver, Sim3Solver, horn_sim3
from ppg_slam_tpu.worldmap import Frame, KeyFrame, Map, MapPoint, Rig
from ppg_slam_tpu.geometry import so3

import jax.numpy as jnp

RNG = np.random.RandomState(51)


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene()


@pytest.fixture()
def rig():
    return Rig(CAM)


def make_frame(scene, rig, k, **kw):
    Rcw, tcw = scene.pose(k)
    feats, ids = scene.render(Rcw, tcw, **kw)
    f = Frame(feats, timestamp=0.05 * k, rig=rig)
    f.set_pose(Rcw, tcw)
    return f, ids


class TestMatcherInit:
    def test_search_for_initialization(self, scene, rig):
        f1, ids1 = make_frame(scene, rig, 0)
        f2, ids2 = make_frame(scene, rig, 6, desc_noise=0.05)
        m = Matcher(CAM, nn_ratio=0.9)
        prev = f1.kp.copy()
        matches12, n = m.search_for_initialization(f1, f2, prev, window=100)
        assert n > 50
        # verify correctness against ground-truth ids
        good = 0
        for i1, i2 in enumerate(matches12):
            if i2 >= 0:
                good += ids1[i1] == ids2[i2]
        assert good / max(n, 1) > 0.95


class TestWorldMapGrowth:
    def test_initial_map_and_incremap(self, scene, rig):
        wm = Map(rig)
        m = Matcher(CAM, nn_ratio=0.9)

        f1, ids1 = make_frame(scene, rig, 0)
        f2, ids2 = make_frame(scene, rig, 6)
        kf1 = KeyFrame(f1, wm)
        kf2 = KeyFrame(f2, wm)
        kf2.prev_kf = kf1
        kf1.next_kf = kf2

        # seed the map: create MapPoints from ground-truth correspondences
        prev = f1.kp.copy()
        matches12, n = m.search_for_initialization(f1, f2, prev, window=100)
        created = 0
        for i1, i2 in enumerate(matches12):
            if i2 < 0 or created >= 60:
                continue
            mp = MapPoint(scene.points[ids1[i1]], kf1)
            mp.add_observation(kf1, i1)
            mp.add_observation(kf2, int(i2))
            kf1.add_map_point(mp, i1)
            kf2.add_map_point(mp, int(i2))
            mp.compute_distinctive_descriptor()
            mp.update_normal_and_depth()
            wm.add_map_point(mp)
            created += 1
        kf1.update_connections()
        kf2.update_connections()
        wm.add_keyframe(kf1)
        assert kf2.connections.get(kf1, 0) == created

        # new KF: triangulate against the temporal chain
        f3, ids3 = make_frame(scene, rig, 12)
        kf3 = KeyFrame(f3, wm)
        kf3.prev_kf = kf2
        kf2.next_kf = kf3
        # carry over matches from ground truth (as tracking would)
        id_to_mp = {}
        for i1, i2 in enumerate(matches12):
            if i2 >= 0 and kf1.map_points[i1] is not None:
                id_to_mp[ids1[i1]] = kf1.map_points[i1]
        for i3, g in enumerate(ids3):
            if g in id_to_mp:
                kf3.add_map_point(id_to_mp[g], i3)

        n_before = wm.n_map_points()
        wm.incre_map(kf3, m)
        n_after = wm.n_map_points()
        assert n_after > n_before, "triangulation must add points"
        # triangulated points close to ground truth
        errs = []
        for mp in wm.all_map_points():
            idx3 = mp.get_index_in_keyframe(kf3)
            if idx3 >= 0 and mp.first_kf_id == kf3.mnId:
                errs.append(np.linalg.norm(mp.pos - scene.points[ids3[idx3]]))
        assert errs and np.median(errs) < 0.02
        # edges + colines created
        assert len(wm.map_edges) > 0
        assert kf3 in wm.keyframes


class TestExtendMapMatches:
    def test_seed_growing_matches_connected_points(self, scene, rig):
        wm = Map(rig)
        m = Matcher(CAM, nn_ratio=0.9)
        f1, ids1 = make_frame(scene, rig, 0)
        kf1 = KeyFrame(f1, wm)
        # create map points for ALL keypoints of kf1 + map edges
        mps = {}
        for i, g in enumerate(ids1):
            mp = MapPoint(scene.points[g], kf1)
            mp.add_observation(kf1, i)
            kf1.add_map_point(mp, i)
            mp.descriptor = scene.descs[g].copy()
            mp.update_normal_and_depth()
            mps[g] = mp
            wm.add_map_point(mp)
        from ppg_slam_tpu.worldmap.elements import MapEdge
        for (a, b) in scene.segments:
            if a in mps and b in mps:
                me = MapEdge(mps[a], mps[b])
                me.valid = True
                wm.add_map_edge(me)

        # target frame with noisy descriptors
        f2, ids2 = make_frame(scene, rig, 4, desc_noise=0.03)
        f2.set_pose(*scene.pose(4))
        points = list(mps.values())
        for mp in points:
            f2.check_in_frustum(mp, 0.5)
        n = m.extend_map_matches(f2, points, th=1.0)
        # verify matched identity
        good = bad = 0
        for i2, mp in enumerate(f2.map_points):
            if mp is None:
                continue
            g = ids2[i2]
            if g in mps and mps[g] is mp:
                good += 1
            else:
                bad += 1
        assert good > 60
        assert bad <= good * 0.05
        # the return value counts EVERY association (seed + grown), matching
        # the reference semantics (Matcher.cpp:203-381); r1 double-counted
        # seeds and never counted grown matches
        n_assoc = sum(1 for mp in f2.map_points if mp is not None)
        assert n == n_assoc, (n, n_assoc)


class TestSim3Solver:
    def test_recovers_sim3_with_outliers(self):
        n = 60
        X1 = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
                       RNG.uniform(3, 8, n)], 1).astype(np.float32)
        R = np.asarray(so3.exp(jnp.asarray([0.1, -0.2, 0.05])), np.float32)
        s = 1.4
        t = np.float32([0.3, -0.2, 0.5])
        # X1 = s R X2 + t  =>  X2 = (1/s) R^T (X1 - t)
        X2 = ((X1 - t) @ R) / s
        bad = RNG.choice(n, 10, replace=False)
        X2_n = X2.copy()
        X2_n[bad] += RNG.randn(10, 3) * 0.8
        uv1 = np.asarray(CAM.project(jnp.asarray(X1)))
        uv2 = np.asarray(CAM.project(jnp.asarray(X2_n.astype(np.float32))))

        solver = Sim3Solver(X1, X2_n.astype(np.float32), uv1, uv2, CAM,
                            fix_scale=False, min_inliers=20)
        T, inl, n_in, _ = solver.iterate(100)
        assert T is not None
        R_est, t_est, s_est = solver.get_estimates()
        assert abs(s_est - s) < 0.02
        np.testing.assert_allclose(R_est, R, atol=5e-3)
        np.testing.assert_allclose(t_est, t, atol=2e-2)
        assert not inl[bad].any()

    def test_horn_exact(self):
        n = 10
        P2 = RNG.randn(3, n)
        R = np.asarray(so3.exp(jnp.asarray([0.3, 0.1, -0.2])), np.float64)
        P1 = 2.0 * R @ P2 + np.array([[1.0], [2.0], [3.0]])
        R_e, t_e, s_e = horn_sim3(P1, P2)
        assert abs(s_e - 2.0) < 1e-4
        np.testing.assert_allclose(R_e, R, atol=1e-4)


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        n = 80
        Xw = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
                       RNG.uniform(3, 8, n)], 1).astype(np.float32)
        Rcw = np.asarray(so3.exp(jnp.asarray([0.1, -0.05, 0.2])), np.float32)
        tcw = np.float32([0.2, -0.1, 0.3])
        uv = np.array(CAM.project(jnp.asarray(Xw @ Rcw.T + tcw)))
        bad = RNG.choice(n, 15, replace=False)
        uv[bad] += RNG.randn(15, 2) * 50 + 20
        solver = PnPSolver(Xw, uv, CAM, min_inliers=30)
        ok, R, t, inl, n_in, _ = solver.iterate(200)
        assert ok
        np.testing.assert_allclose(R, Rcw, atol=2e-3)
        np.testing.assert_allclose(t, tcw, atol=1e-2)
        assert n_in >= 60
