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

CAM = CameraModel(kind=CAM_PINHOLE, fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                  dist=(0.0, 0.0, 0.0, 0.0), width=640, height=480)


def test_dryrun_8_devices():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    dryrun_sharded_ba_step(mesh)


def test_sharded_assembly_matches_single_device():
    rng = np.random.RandomState(0)
    n_kf, n_mp, n_obs = 4, 32, 256
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (n_kf, 3, 3)).copy()
    t = rng.randn(n_kf, 3).astype(np.float32) * 0.1
    X = np.stack([rng.uniform(-1, 1, n_mp), rng.uniform(-1, 1, n_mp),
                  rng.uniform(3, 6, n_mp)], 1).astype(np.float32)
    r_kf = rng.randint(0, n_kf, n_obs).astype(np.int32)
    r_mp = rng.randint(0, n_mp, n_obs).astype(np.int32)
    r_uv = rng.uniform(0, 480, (n_obs, 2)).astype(np.float32)
    r_valid = np.ones(n_obs, bool)

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("dp",))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("dp",))
    f8 = sharded_reproj_normal_eq(mesh8, CAM)
    f1 = sharded_reproj_normal_eq(mesh1, CAM)

    def put(mesh, arrs):
        shard = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        return ([jax.device_put(jnp.asarray(a), rep) for a in arrs[:3]]
                + [jax.device_put(jnp.asarray(a), shard) for a in arrs[3:]])

    H8, g8, Hll8, bl8 = f8(*put(mesh8, [R, t, X, r_kf, r_mp, r_uv, r_valid]))
    H1, g1, Hll1, bl1 = f1(*put(mesh1, [R, t, X, r_kf, r_mp, r_uv, r_valid]))
    np.testing.assert_allclose(np.asarray(H8), np.asarray(H1), atol=1e-2,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1), atol=1e-2,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Hll8), np.asarray(Hll1), atol=1e-3,
                               rtol=1e-4)
