"""Multi-device sharded BA tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.parallel import (
    dryrun_sharded_ba_step,
    sharded_reproj_normal_eq,
)
from ppg_slam_tpu.parallel.sharded_ba import schur_solve
from ppg_slam_tpu.estimator.ba_core import DOF

CAM = CameraModel(kind=CAM_PINHOLE, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                  dist=(0.0, 0.0, 0.0, 0.0), width=640, height=480)


def _problem(rng, n_kf=4, n_mp=32, n_obs=256):
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (n_kf, 3, 3)).copy()
    t = rng.randn(n_kf, 3).astype(np.float32) * 0.1
    X = np.stack([rng.uniform(-1, 1, n_mp), rng.uniform(-1, 1, n_mp),
                  rng.uniform(3, 6, n_mp)], 1).astype(np.float32)
    r_kf = rng.randint(0, n_kf, n_obs).astype(np.int32)
    r_mp = rng.randint(0, n_mp, n_obs).astype(np.int32)
    r_uv = rng.uniform(0, 480, (n_obs, 2)).astype(np.float32)
    r_valid = np.ones(n_obs, bool)
    return R, t, X, r_kf, r_mp, r_uv, r_valid


def _put(mesh, arrs):
    shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return ([jax.device_put(jnp.asarray(a), rep) for a in arrs[:3]]
            + [jax.device_put(jnp.asarray(a), shard) for a in arrs[3:]])


def test_dryrun_8_devices():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    dryrun_sharded_ba_step(mesh)


def test_graft_dryrun_multichip():
    """The driver's multichip gate, run in-process on the CPU mesh."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_assembly_matches_single_device():
    rng = np.random.RandomState(0)
    prob = _problem(rng)

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("dp",))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("dp",))
    f8 = sharded_reproj_normal_eq(mesh8, CAM)
    f1 = sharded_reproj_normal_eq(mesh1, CAM)

    out8 = f8(*_put(mesh8, list(prob)))
    out1 = f1(*_put(mesh1, list(prob)))
    for a8, a1, name in zip(out8, out1, ["H", "g", "Hll", "bl", "W"]):
        np.testing.assert_allclose(np.asarray(a8), np.asarray(a1),
                                   atol=1e-2, rtol=1e-4, err_msg=name)


def test_schur_step_equals_dense_full_system_solve():
    """The sharded Schur step must equal solving the full (poses ⊕ landmarks)
    damped normal equations dense — proving the W cross-term is exact."""
    rng = np.random.RandomState(1)
    n_kf, n_mp, n_obs = 3, 12, 160
    prob = _problem(rng, n_kf, n_mp, n_obs)
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("dp",))
    f8 = sharded_reproj_normal_eq(mesh8, CAM)
    H, g, Hll, b_l, W = [np.asarray(x, np.float64)
                         for x in f8(*_put(mesh8, list(prob)))]

    lam = 1e-2
    nd = n_kf * DOF

    # dense full system
    full = np.zeros((nd + 3 * n_mp, nd + 3 * n_mp))
    full[:nd, :nd] = H + lam * np.eye(nd)
    full[np.arange(DOF), np.arange(DOF)] += 1e8  # gauge prior on pose 0
    for m in range(n_mp):
        full[nd + 3 * m: nd + 3 * m + 3, nd + 3 * m: nd + 3 * m + 3] = (
            Hll[m] + lam * np.eye(3))
    Wf = W.reshape(nd, n_mp * 3)
    full[:nd, nd:] = Wf
    full[nd:, :nd] = Wf.T
    rhs = np.concatenate([g, b_l.reshape(-1)])
    sol = -np.linalg.solve(full, rhs)

    # schur_solve is dtype-generic; run in f64 so the comparison isolates
    # algebraic exactness (the W term), not float32 conditioning.
    dx, dX = schur_solve(
        jnp.asarray(H), jnp.asarray(g), jnp.asarray(Hll),
        jnp.asarray(b_l), jnp.asarray(W), jnp.float64(lam))
    np.testing.assert_allclose(np.asarray(dx), sol[:nd], atol=1e-8,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dX).reshape(-1), sol[nd:],
                               atol=1e-8, rtol=1e-6)


def test_sharded_step_reduces_reprojection_error():
    """A perturbed problem must improve after one sharded GN step."""
    from ppg_slam_tpu.parallel.sharded_ba import sharded_ba_step
    from ppg_slam_tpu.estimator.ba_core import make_reproj_residual

    rng = np.random.RandomState(2)
    n_kf, n_mp, n_obs = 4, 24, 24 * 4
    # ground truth: points ahead of identity-ish cameras
    X_gt = np.stack([rng.uniform(-1, 1, n_mp), rng.uniform(-1, 1, n_mp),
                     rng.uniform(4, 6, n_mp)], 1).astype(np.float32)
    t_gt = np.zeros((n_kf, 3), np.float32)
    t_gt[:, 0] = np.linspace(0, 0.5, n_kf)
    R_gt = np.broadcast_to(np.eye(3, dtype=np.float32), (n_kf, 3, 3)).copy()
    r_kf = np.repeat(np.arange(n_kf, dtype=np.int32), n_mp)[:n_obs]
    r_mp = np.tile(np.arange(n_mp, dtype=np.int32), n_kf)[:n_obs]

    res_fn = make_reproj_residual(CAM, jnp.eye(3), jnp.zeros(3))

    def project(R, t, X):
        z15 = jnp.zeros(DOF, jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        return jax.vmap(lambda k, m: res_fn(
            z15, z3, jnp.asarray(R)[k], jnp.asarray(t)[k],
            jnp.asarray(X)[m], jnp.zeros(2)))(r_kf, r_mp)

    r_uv = -np.asarray(project(R_gt, t_gt, X_gt))  # exact observations
    r_valid = np.ones(n_obs, bool)

    X0 = X_gt + rng.randn(n_mp, 3).astype(np.float32) * 0.02
    t0 = t_gt + rng.randn(n_kf, 3).astype(np.float32) * 0.01
    t0[0] = t_gt[0]

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("dp",))
    step = sharded_ba_step(mesh8, CAM)
    args = _put(mesh8, [R_gt, t0, X0, r_kf, r_mp,
                        r_uv.astype(np.float32), r_valid])
    R1, t1, X1 = step(*args, jnp.float32(1e-4))

    def cost(R, t, X):
        r = project(np.asarray(R), np.asarray(t), np.asarray(X)) + r_uv
        return float(jnp.sum(r * r))

    c0 = cost(R_gt, t0, X0)
    c1 = cost(R1, t1, X1)
    assert c1 < 0.2 * c0, (c0, c1)
