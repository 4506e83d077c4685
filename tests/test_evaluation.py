"""ATE evaluation harness: Umeyama alignment, TUM/EuRoC file parsing, stamp
association, and the evaluate CLI (the in-repo analog of the reference's
offline evo evaluation — Viewer.cpp:853-959 writes, BASELINE.md gates)."""

import numpy as np

from ppg_slam_tpu.utils.evaluation import (align_and_ate, associate,
                                           evaluate_files, load_tum, umeyama)


def _traj(n=60, seed=0):
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 6, n)
    pos = np.stack([np.cos(t), np.sin(t), 0.1 * t], 1)
    return t, pos, rng


class TestUmeyama:
    def test_recovers_similarity(self):
        t, gt, rng = _traj()
        s_true, ang = 0.43, 0.7
        R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                           [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        t_true = np.array([1.0, -2.0, 0.5])
        est = (gt - t_true) @ R_true / s_true  # inverse transform
        s, R, tr = umeyama(est, gt, with_scale=True)
        assert abs(s - s_true) < 1e-9
        res = align_and_ate(est, gt)
        assert res.rmse < 1e-9
        assert res.scale == s

    def test_se3_alignment_keeps_scale_error(self):
        _, gt, _ = _traj()
        est = gt * 2.0
        r_sim3 = align_and_ate(est, gt, with_scale=True)
        r_se3 = align_and_ate(est, gt, with_scale=False)
        assert r_sim3.rmse < 1e-9
        assert r_se3.rmse > 0.1
        assert r_se3.scale == 1.0

    def test_rmse_value(self):
        _, gt, rng = _traj()
        est = gt + rng.randn(*gt.shape) * 0.01
        res = align_and_ate(est, gt)
        assert 0.003 < res.rmse < 0.03
        assert res.mean <= res.rmse <= res.max


class TestFilesAndCli:
    def test_tum_roundtrip_and_association(self, tmp_path):
        t, gt, rng = _traj()
        est = gt + rng.randn(*gt.shape) * 0.005
        fe, fg = tmp_path / "est.txt", tmp_path / "gt.txt"
        with open(fe, "w") as f:
            f.write("# estimate\n")
            for ti, p in zip(t, est):
                f.write(f"{ti:.6f} {p[0]} {p[1]} {p[2]} 0 0 0 1\n")
        with open(fg, "w") as f:
            # EuRoC-style: comma-separated, nanosecond stamps, header
            f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
            for ti, p in zip(t + 0.004, gt):  # stamp offset < max_diff
                f.write(f"{(ti + 1.4e9) * 1e9:.0f},{p[0]},{p[1]},{p[2]},"
                        "1,0,0,0\n")
        ts, ps = load_tum(str(fg))
        assert len(ts) == len(t) and ts[0] < 1e14  # ns converted to s
        # the est file has no 1.4e9 epoch offset, so shift it for association
        with open(fe, "w") as f:
            for ti, p in zip(t, est):
                f.write(f"{ti + 1.4e9:.6f} {p[0]} {p[1]} {p[2]} 0 0 0 1\n")
        res = evaluate_files(str(fe), str(fg))
        assert res.n_pairs == len(t)
        assert res.rmse < 0.02

    def test_association_is_injective(self):
        te = np.array([0.0, 0.01, 0.02])
        tg = np.array([0.005])
        ie, ig = associate(te, tg, max_diff=0.02)
        assert len(ie) == 1 and len(set(ig.tolist())) == len(ig)

    def test_cli(self, tmp_path, capsys):
        from ppg_slam_tpu.cli.evaluate import main

        t, gt, rng = _traj()
        est = gt * 3.0 + rng.randn(*gt.shape) * 0.003
        fe, fg = tmp_path / "e.txt", tmp_path / "g.txt"
        for path, arr in ((fe, est), (fg, gt)):
            with open(path, "w") as f:
                for ti, p in zip(t, arr):
                    f.write(f"{ti} {p[0]} {p[1]} {p[2]} 0 0 0 1\n")
        assert main([str(fe), str(fg), "--json"]) == 0
        import json

        out = json.loads(capsys.readouterr().out)
        assert out["ate_rmse"] < 0.02
        assert abs(out["scale"] - 1 / 3) < 0.01


class TestRpe:
    def test_zero_for_identical(self, tmp_path):
        from ppg_slam_tpu.utils.evaluation import rpe_trans

        t, gt, rng = _traj()
        res = rpe_trans(t, gt.copy(), t, gt, delta=1.0)
        assert res.rmse < 1e-12
        assert res.n_pairs > 10

    def test_measures_local_drift_not_global_scale(self):
        """A globally mis-scaled but locally perfect trajectory has ~zero
        RPE after the Umeyama scale fix; accumulated drift does not."""
        from ppg_slam_tpu.utils.evaluation import rpe_trans

        t, gt, rng = _traj(n=120)
        scaled = gt * 2.5
        res = rpe_trans(t, scaled, t, gt, delta=1.0)
        assert res.rmse < 1e-9
        # linear drift along x: displacement norms now differ per window
        drift = gt + np.outer(np.linspace(0, 0.6, len(t)),
                              np.float64([1, 0, 0]))
        res2 = rpe_trans(t, drift, t, gt, delta=1.0, with_scale=False)
        assert res2.rmse > 0.01

    def test_cli_rpe(self, tmp_path, capsys):
        import json

        from ppg_slam_tpu.cli.evaluate import main

        t, gt, rng = _traj()
        est = gt * 2.0 + rng.randn(*gt.shape) * 0.002
        fe, fg = tmp_path / "e.txt", tmp_path / "g.txt"
        for path, arr in ((fe, est), (fg, gt)):
            with open(path, "w") as f:
                for ti, p in zip(t, arr):
                    f.write(f"{ti} {p[0]} {p[1]} {p[2]} 0 0 0 1\n")
        assert main([str(fe), str(fg), "--json", "--rpe", "1.0"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["rpe_rmse"] < 0.02
        assert out["rpe_delta_s"] == 1.0
