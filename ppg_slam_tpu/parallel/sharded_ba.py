"""Multi-chip scaling: residual-sharded bundle adjustment over a device mesh.

The reference is single-process (SURVEY.md §2.8); the TPU-native scale-out
path shards the dominant BA work — per-observation residual linearization and
Hessian/gradient assembly — across devices with `shard_map`, reducing the
normal equations with `psum` over the mesh (ICI collectives), then performing
the landmark Schur elimination and the small dense pose solve replicated.
This is data parallelism over residual blocks: observation count grows with
map size while the pose-state dimension stays small, so communication is
O((pose dim)^2 + pose×landmark cross blocks), independent of observation
count.

The step solved here is the REAL damped-GN/Schur step (same structure as
estimator.ba_core.solve_ba): the pose-landmark cross term W is assembled and
eliminated exactly — `tests/test_parallel.py` proves the sharded step equals
a dense full-system solve, and that 8-device == 1-device.

Also hosts the front-end batch parallelism used for multi-camera / multi-
sequence serving: frames shard over the mesh, weights replicate.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..estimator.ba_core import DOF, make_reproj_residual
from ..geometry.cameras import CAM_PINHOLE, CameraModel


def sharded_reproj_normal_eq(mesh: Mesh, cam: CameraModel):
    """Build a jitted, mesh-sharded (H, g, Hll, b_l, W) assembler.

    Inputs (sharded over axis 'dp' on the observation dimension):
      r_kf (O,), r_mp (O,), r_uv (O, 2), r_valid (O,)
    Replicated: states R (N,3,3), t (N,3), points (M,3).
    Returns replicated:
      H   (N*DOF, N*DOF)  pose-pose block (block-diagonal for reprojection),
      g   (N*DOF,)        pose gradient,
      Hll (M, 3, 3)       landmark-landmark diagonal blocks,
      b_l (M, 3)          landmark gradient,
      W   (N*DOF, M, 3)   pose-landmark cross blocks (the Schur coupling).
    """
    res_fn = make_reproj_residual(cam, jnp.eye(3), jnp.zeros(3))

    def local_assemble(R, t, X, r_kf, r_mp, r_uv, r_valid):
        n = R.shape[0]
        m = X.shape[0]

        def one(kf, mp, uv):
            z15 = jnp.zeros(DOF, jnp.float32)
            z3 = jnp.zeros(3, jnp.float32)
            r = res_fn(z15, z3, R[kf], t[kf], X[mp], uv)
            Jk, Jx = jax.jacfwd(res_fn, argnums=(0, 1))(
                z15, z3, R[kf], t[kf], X[mp], uv)
            return r, Jk, Jx

        r, Jk, Jx = jax.vmap(one)(r_kf, r_mp, r_uv)
        w = r_valid.astype(jnp.float32)
        r = r * w[:, None]
        Jk = Jk * w[:, None, None]
        Jx = Jx * w[:, None, None]
        H = jnp.zeros((n, DOF, n, DOF), jnp.float32)
        g = jnp.zeros((n, DOF), jnp.float32)
        H = H.at[r_kf, :, r_kf, :].add(jnp.einsum("odi,odj->oij", Jk, Jk))
        g = g.at[r_kf].add(jnp.einsum("odi,od->oi", Jk, r))
        Hll = jnp.zeros((m, 3, 3), jnp.float32)
        b_l = jnp.zeros((m, 3), jnp.float32)
        Hll = Hll.at[r_mp].add(jnp.einsum("odi,odj->oij", Jx, Jx))
        b_l = b_l.at[r_mp].add(jnp.einsum("odi,od->oi", Jx, r))
        # pose-landmark cross blocks (Schur coupling term)
        Wc = jnp.zeros((n, DOF, m, 3), jnp.float32)
        Wc = Wc.at[r_kf, :, r_mp, :].add(jnp.einsum("odi,odj->oij", Jk, Jx))
        # all-reduce the partial normal equations over the mesh (ICI psum)
        H = jax.lax.psum(H, "dp")
        g = jax.lax.psum(g, "dp")
        Hll = jax.lax.psum(Hll, "dp")
        b_l = jax.lax.psum(b_l, "dp")
        Wc = jax.lax.psum(Wc, "dp")
        return (H.reshape(n * DOF, n * DOF), g.reshape(n * DOF), Hll, b_l,
                Wc.reshape(n * DOF, m, 3))

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        local_assemble, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P(), P(), P(), P()),
    )
    return jax.jit(sharded)


def schur_solve(H, g, Hll, b_l, W, lam, fix_first: bool = True):
    """Exact landmark Schur elimination + damped pose solve.

    S  = Hpp + lam I - W Hll_d^{-1} W^T
    dx = -S^{-1} (g - W Hll_d^{-1} b_l)
    dX = -Hll_d^{-1} (b_l + W^T dx)
    with Hll_d = Hll + lam I (LM damping on both blocks). Mirrors
    estimator.ba_core's Schur structure; gauge fixed by a large prior on the
    first pose block (the reference fixes the origin KF,
    /root/reference/optimizing/src/OptimizerGBA.cpp:24-289).
    """
    nd = H.shape[0]
    Hll_d = Hll + lam * jnp.eye(3, dtype=H.dtype)[None]
    Hll_inv = jnp.linalg.inv(Hll_d)
    WHinv = jnp.einsum("amj,mjk->amk", W, Hll_inv)       # (nD, M, 3)
    S = H + lam * jnp.eye(nd, dtype=H.dtype)
    S = S - jnp.einsum("amk,bmk->ab", WHinv, W)
    rhs = g - jnp.einsum("amk,mk->a", WHinv, b_l)
    if fix_first:
        S = S.at[jnp.arange(DOF), jnp.arange(DOF)].add(1e8)
    dx = -jnp.linalg.solve(S, rhs)
    dX = -jnp.einsum("mij,mj->mi", Hll_inv,
                     b_l + jnp.einsum("amj,a->mj", W, dx))
    return dx, dX


def sharded_ba_step(mesh: Mesh, cam: CameraModel):
    """One full damped-GN BA step: sharded assembly -> replicated exact
    Schur + Cholesky solve -> state update. Returns the jitted step fn."""
    assemble = sharded_reproj_normal_eq(mesh, cam)

    def step(R, t, X, r_kf, r_mp, r_uv, r_valid, lam):
        from ..geometry import so3

        H, g, Hll, b_l, W = assemble(R, t, X, r_kf, r_mp, r_uv, r_valid)
        n = R.shape[0]
        dx, dX = schur_solve(H, g, Hll, b_l, W, lam)
        dx = dx.reshape(n, DOF)
        R_new = so3.normalize(R @ so3.exp(dx[:, :3]))
        t_new = t + jnp.einsum("nij,nj->ni", R, dx[:, 3:6])
        return R_new, t_new, X + dX

    return jax.jit(step)


def dryrun_sharded_ba_step(mesh: Mesh) -> None:
    """Compile + run one sharded BA step on tiny shapes (driver dry run)."""
    cam = CameraModel(kind=CAM_PINHOLE, fx=100.0, fy=100.0, cx=32.0, cy=32.0,
                      dist=(0.0, 0.0, 0.0, 0.0), width=64, height=64)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_kf, n_mp = 4, 16
    n_obs = 8 * n_dev
    rng = np.random.RandomState(0)
    dev0 = mesh.devices.ravel()[0]
    with jax.default_device(dev0):
        R = jnp.broadcast_to(jnp.eye(3), (n_kf, 3, 3)).astype(jnp.float32)
        t = jnp.asarray(rng.randn(n_kf, 3).astype(np.float32) * 0.1)
        X = jnp.asarray(
            np.stack([rng.uniform(-1, 1, n_mp), rng.uniform(-1, 1, n_mp),
                      rng.uniform(3, 5, n_mp)], 1).astype(np.float32))
        r_kf = jnp.asarray(rng.randint(0, n_kf, n_obs).astype(np.int32))
        r_mp = jnp.asarray(rng.randint(0, n_mp, n_obs).astype(np.int32))
        r_uv = jnp.asarray(rng.uniform(0, 64, (n_obs, 2)).astype(np.float32))
        r_valid = jnp.ones(n_obs, bool)

    shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    r_kf = jax.device_put(r_kf, shard)
    r_mp = jax.device_put(r_mp, shard)
    r_uv = jax.device_put(r_uv, shard)
    r_valid = jax.device_put(r_valid, shard)
    R = jax.device_put(R, rep)
    t = jax.device_put(t, rep)
    X = jax.device_put(X, rep)

    step = sharded_ba_step(mesh, cam)
    R2, t2, X2 = step(R, t, X, r_kf, r_mp, r_uv, r_valid,
                      jnp.float32(1e-3))
    jax.block_until_ready((R2, t2, X2))
