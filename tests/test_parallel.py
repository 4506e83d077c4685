"""Multi-device sharded BA on the 8-device virtual CPU mesh.

The sharded path is the FULL solver (estimator.ba_core.solve_ba with a mesh
axis): reprojection + colines (incl. PCG cross-terms) + inertial links +
bias walks + priors, robust weights, damped accept/reject loop. These tests
prove 8-device == 1-device on a visual-inertial problem WITH colines, at
small and at realistic local-window shapes, and that the BA entry points can
route through the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ppg_slam_tpu.estimator.ba_core import BAOptions, solve_ba
from ppg_slam_tpu.parallel import (dryrun_sharded_ba_step, make_vi_problem,
                                   pad_problem_for_mesh, solve_ba_sharded)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def _solve_both(n_kf, n_mp, n_obs, n_col, iters=3, seed=0):
    cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
        n_kf=n_kf, n_mp=n_mp, n_obs=n_obs, n_col=n_col, seed=seed)
    opts = BAOptions(iters=iters, lambda0=1e-2, tol=0.0)
    eye = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    ref = solve_ba(states, points, prob, kf_dof, mp_free, eye, z3, cam, opts)
    shd = solve_ba_sharded(states, points, prob, kf_dof, mp_free, eye, z3,
                           cam, opts, _mesh(8))
    return ref, shd, prob


class TestShardedEqualsSingle:
    def test_small_vi_problem(self):
        (st_r, pts_r, info_r), (st_s, pts_s, info_s), prob = _solve_both(
            n_kf=6, n_mp=64, n_obs=256, n_col=16)
        # chi2 must actually improve (this is a real solve, not a no-op)
        hist = np.asarray(info_r["chi2_hist"])
        assert hist[-1] < hist[0] * 0.5
        np.testing.assert_allclose(np.asarray(info_s["chi2_hist"]), hist,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st_s.t), np.asarray(st_r.t),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_s.R), np.asarray(st_r.R),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_s.v), np.asarray(st_r.v),
                                   atol=1e-5)
        # landmarks go through the f32 PCG whose psum changes reduction
        # order: agreement to ~1e-3 is float noise, not algorithm drift
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_r),
                                   atol=2e-3)
        # per-observation outlier stats must cover the same observations
        n_obs = prob.r_uv.shape[0]
        np.testing.assert_allclose(
            np.asarray(info_s["obs_chi2"])[:n_obs],
            np.asarray(info_r["obs_chi2"])[:n_obs], atol=1e-2)

    @pytest.mark.slow
    def test_realistic_window_shape(self):
        """VERDICT r1 item 4: ≥50 KF / 5k MP / 40k obs with colines.
        Slow lane: two full solves at GBA scale take minutes on the 1-core
        CI host; the same sharded==single property is covered at small
        shapes by test_small_vi_problem in the default lane."""
        (st_r, pts_r, info_r), (st_s, pts_s, info_s), _ = _solve_both(
            n_kf=50, n_mp=5120, n_obs=40960, n_col=512, iters=2, seed=1)
        hist = np.asarray(info_r["chi2_hist"])
        assert hist[-1] < hist[0]
        np.testing.assert_allclose(np.asarray(info_s["chi2_hist"]), hist,
                                   rtol=5e-4)
        np.testing.assert_allclose(np.asarray(st_s.t), np.asarray(st_r.t),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_r),
                                   atol=1e-3)

    def test_implicit_sharded_equals_single(self):
        """The IMPLICIT sharded path (per-shard slot-major relayout,
        O(M+N) psums — VERDICT r4 #5) must reproduce the single-device
        dense solve: same chi2 trajectory, same states, and per-obs stats
        re-gathered to the caller's observation order."""
        from ppg_slam_tpu.parallel.sharded_ba import _shard_obs_layout

        cam, states, points, prob, kf_dof, mp_free = make_vi_problem(
            n_kf=12, n_mp=256, n_obs=1024, n_col=32, seed=3)
        # pose CG forced on (the implicit operator has no Cholesky route)
        opts = BAOptions(iters=3, lambda0=1e-2, tol=0.0, pose_cg_iters=96)
        eye = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        ref = solve_ba(states, points, prob, kf_dof, mp_free, eye, z3,
                       cam, opts)
        shd = solve_ba_sharded(states, points, prob, kf_dof, mp_free, eye,
                               z3, cam, opts, _mesh(8), implicit=True)
        (st_r, pts_r, info_r), (st_s, pts_s, info_s) = ref, shd
        hist = np.asarray(info_r["chi2_hist"])
        assert hist[-1] < hist[0] * 0.5
        np.testing.assert_allclose(np.asarray(info_s["chi2_hist"]), hist,
                                   rtol=1e-4)
        # CG reduction-order noise accumulates over ~100 matvecs along
        # low-curvature directions; chi2 agreement above pins convergence
        np.testing.assert_allclose(np.asarray(st_s.t), np.asarray(st_r.t),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_r),
                                   atol=2e-3)
        valid = np.asarray(prob.r_valid)
        np.testing.assert_allclose(
            np.asarray(info_s["obs_chi2"])[valid],
            np.asarray(info_r["obs_chi2"])[valid], atol=1e-2)
        # the relayout itself must be a permutation: every valid input obs
        # lands on exactly one new row carrying its (kf, mp, uv)
        o_kf, o_mp, o_uv, o_val, perm, pmask, K, rowmap = \
            _shard_obs_layout(prob, 8, points.shape[0], states.R.shape[0])
        live = rowmap >= 0
        assert int(live.sum()) == int(valid.sum())
        rows = rowmap[live]
        assert len(np.unique(rows)) == len(rows)
        np.testing.assert_array_equal(o_kf[rows],
                                      np.asarray(prob.r_kf)[live])
        np.testing.assert_array_equal(o_mp[rows],
                                      np.asarray(prob.r_mp)[live])
        assert o_val[rows].all()
        # slot region r_mp is row//K within each shard block
        O_local = len(o_kf) // 8
        blk = o_mp[:O_local]
        M = points.shape[0]
        np.testing.assert_array_equal(
            blk[: M * K], np.arange(M * K, dtype=np.int64) // K)

    def test_pad_problem_for_mesh(self):
        _, _, _, prob, _, _ = make_vi_problem(n_kf=4, n_mp=16, n_obs=37,
                                              n_col=5)
        p = pad_problem_for_mesh(prob, 8)
        for name in ("r_kf", "c_idx", "i_kf1", "p_kf", "bp_kf"):
            assert getattr(p, name).shape[0] % 8 == 0
        assert int(jnp.sum(p.r_valid)) == int(jnp.sum(prob.r_valid))
        assert int(jnp.sum(p.i_valid)) == int(jnp.sum(prob.i_valid))


class TestEntryPointsOnMesh:
    def test_full_inertial_ba_mesh_on_live_map(self):
        """full_inertial_ba(mesh=) must run on a real map and move it the
        same way the single-device call does."""
        import copy
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from synthetic_sequence import SyntheticExtractor, SyntheticSequence
        from synthetic_world import CAM

        from ppg_slam_tpu.estimator.ba import full_inertial_ba
        from ppg_slam_tpu.pipeline.local_mapping import LocalMapping
        from ppg_slam_tpu.pipeline.tracking import Tracking
        from ppg_slam_tpu.worldmap import Map, Rig, reset_ids

        from ppg_slam_tpu.worldmap.serialize import load_map, save_map

        def build_map():
            # prefer the VI map the pipeline-e2e module already tracked
            # (map_store donation) — building another 48-frame tracked map
            # costs ~30 s on the 1-core CI host
            import map_store

            cached = map_store.get_map("straight")
            if cached is not None:
                return cached
            reset_ids()
            seq = SyntheticSequence(n_frames=48)
            rig = Rig(CAM, freq=200.0)
            wmap = Map(rig)
            Map.imu_ini_time = 1.5
            tracking = Tracking(wmap, SyntheticExtractor(seq))
            tracking.local_mapper = LocalMapping(wmap, tracking=tracking)
            last_t = -1.0
            for i in range(seq.n_frames):
                t = seq.frame_times[i]
                tracking.grab_imu(seq.imu_between(last_t, t))
                last_t = t
                tracking.grab_image(np.zeros((2, 2), np.uint8), t)
            return wmap

        import tempfile

        wmap = build_map()
        assert wmap.imu_initialized
        # clone via serialize so the mesh and single-device solves start
        # from identical state without rebuilding the pipeline
        with tempfile.NamedTemporaryFile(suffix=".pkl") as f:
            save_map(wmap, f.name)
            wmap2 = load_map(f.name, rig=wmap.rig)
        poses_before = {kf.mnId: kf.tcw.copy() for kf in wmap.all_keyframes()}
        full_inertial_ba(wmap, iters=4, mesh=_mesh(8))
        moved = [np.linalg.norm(kf.tcw - poses_before[kf.mnId])
                 for kf in wmap.all_keyframes()]
        assert np.isfinite(moved).all()

        full_inertial_ba(wmap2, iters=4)
        ref = sorted((kf.mnId, kf.tcw.copy())
                     for kf in wmap2.all_keyframes())
        got = sorted((kf.mnId, kf.tcw.copy()) for kf in wmap.all_keyframes())
        for (i1, t1), (i2, t2) in zip(ref, got):
            assert i1 == i2
            np.testing.assert_allclose(t2, t1, atol=1e-4)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    """The driver's multichip gate, run in-process on the CPU mesh.

    Covers dryrun_sharded_ba_step(mesh) itself too — dryrun_multichip is a
    thin wrapper around it (__graft_entry__.py:96-98), so a separate direct
    call would recompile the same ~12 s of programs for no extra coverage.
    Slow lane: the driver independently runs this exact gate every round
    (MULTICHIP_r*.json), so the default lane need not pay its ~23 s again.
    """
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
class TestDPFrontend:
    """Data-parallel front-end over the mesh (SURVEY §2.8): the frame batch
    shards over the "dp" axis, one local sub-batch per device, and results
    must equal the single-device batched path exactly (same per-frame
    program, no cross-frame ops).

    Slow lane: the driver's multichip gate (dryrun_multichip, run every
    round as MULTICHIP_r*.json) dispatches this exact extract_batch(mesh=)
    path, so the default verification lane need not pay its ~45 s of
    front-end compiles again; this class adds the exhaustive
    equality/padding assertions on top."""

    @pytest.fixture(scope="class")
    def images(self):
        rng = np.random.RandomState(9)
        imgs = []
        for k in range(8):
            img = np.full((240, 320), 128, np.uint8)
            for i in range(1, 6):
                img[i * 40 - 1 - (k % 3), :] = 255
                img[:, i * 50 - 1 + (k % 4)] = 255
            img = np.clip(img.astype(np.int32)
                          + rng.randint(-15, 15, img.shape), 0,
                          255).astype(np.uint8)
            imgs.append(img)
        return imgs

    @pytest.fixture(scope="class")
    def extractor(self):
        from ppg_slam_tpu.frontend import PPGExtractor
        from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel

        cam = CameraModel(kind=CAM_PINHOLE, fx=200.0, fy=200.0, cx=160.0,
                          cy=120.0, dist=(0.0, 0.0, 0.0, 0.0),
                          width=320, height=240)
        return PPGExtractor(cam)

    @pytest.fixture(scope="class")
    def ref(self, extractor, images):
        return extractor.extract_batch(images)

    def test_sharded_equals_single(self, extractor, images, ref):
        dp = extractor.extract_batch(images, mesh=_mesh(8))
        assert len(dp) == len(ref)
        for a, b in zip(ref, dp):
            assert a.n_kp == b.n_kp
            np.testing.assert_array_equal(a.kp_pos[:a.n_kp],
                                          b.kp_pos[:b.n_kp])
            np.testing.assert_array_equal(a.edges, b.edges)
            np.testing.assert_allclose(a.edge_score, b.edge_score,
                                       atol=1e-6)
            np.testing.assert_allclose(a.desc[:a.n_kp], b.desc[:b.n_kp],
                                       atol=1e-6)

    def test_pads_partial_batch(self, extractor, images, ref):
        """A 6-frame batch on an 8-device mesh pads internally (repeating
        the tail frame to the compiled 8-shape) and returns exactly 6
        results — per-frame extraction is batch-independent, so they must
        equal the corresponding frames of the full-batch reference."""
        dp = extractor.extract_batch(images[:6], mesh=_mesh(8))
        assert len(dp) == 6
        for a, b in zip(ref[:6], dp):
            np.testing.assert_array_equal(a.kp_pos[:a.n_kp],
                                          b.kp_pos[:b.n_kp])
