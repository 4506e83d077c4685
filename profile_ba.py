"""BA solver profiler (run on the real TPU): slope-time the LBA-shaped
solve's sub-phases to find where the per-iteration ~9 ms goes.

Slope timing: time solve_ba at iters=k1 and iters=k2 inside the same
process and divide — each timing forces a fetch (the tunnel's
block_until_ready does not block)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ppg_slam_tpu.estimator import BAOptions, KFStates, empty_problem, solve_ba
from ppg_slam_tpu.estimator.ba_core import _chi2_only, _compute_all
from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel


def build(n_kf=16, n_mp=1024, n_obs=8192, n_col=512):
    cam = CameraModel(kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215,
                      cy=248.375, dist=(0.0, 0.0, 0.0, 0.0),
                      width=752, height=480)
    rng = np.random.RandomState(2)
    points = np.stack([rng.uniform(-3, 3, n_mp), rng.uniform(-2, 2, n_mp),
                       rng.uniform(4, 10, n_mp)], 1).astype(np.float32)
    Rwb = np.broadcast_to(np.eye(3, dtype=np.float32), (n_kf, 3, 3)).copy()
    twb = np.zeros((n_kf, 3), np.float32)
    twb[:, 0] = np.linspace(0, 2, n_kf)
    r_kf = rng.randint(0, n_kf, n_obs).astype(np.int32)
    r_mp = rng.randint(0, n_mp, n_obs).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rwb[r_kf].transpose(0, 2, 1),
                   points[r_mp] - twb[r_kf])
    r_uv = np.stack([458.654 * Xc[:, 0] / Xc[:, 2] + 367.215,
                     457.296 * Xc[:, 1] / Xc[:, 2] + 248.375], 1)
    r_uv += rng.randn(n_obs, 2).astype(np.float32) * 0.5
    prob = empty_problem(n_obs=n_obs, n_col=n_col, n_links=1, n_priors=1,
                         n_bp=1)
    prob = prob._replace(
        r_kf=jnp.asarray(r_kf), r_mp=jnp.asarray(r_mp),
        r_uv=jnp.asarray(r_uv.astype(np.float32)),
        r_valid=jnp.ones(n_obs, bool),
        c_idx=jnp.asarray(rng.randint(0, n_mp, (n_col, 3)).astype(np.int32)),
        c_w=jnp.full((n_col,), 50.0, jnp.float32),
        c_valid=jnp.zeros(n_col, bool))
    tn = twb + rng.randn(n_kf, 3).astype(np.float32) * 0.02
    pn = points + rng.randn(n_mp, 3).astype(np.float32) * 0.02
    states = KFStates(R=jnp.asarray(Rwb), t=jnp.asarray(tn),
                      v=jnp.zeros((n_kf, 3), jnp.float32),
                      bg=jnp.zeros((n_kf, 3), jnp.float32),
                      ba=jnp.zeros((n_kf, 3), jnp.float32))
    kf_dof = np.zeros((n_kf, 15), bool)
    kf_dof[2:, :6] = True
    return cam, states, jnp.asarray(pn), prob, jnp.asarray(kf_dof), \
        jnp.ones(n_mp, bool)


def timeit(fn, n=6):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    cam, states, points, prob, kf_dof, mp_free = build()
    eye = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    def solve_n(iters, adapt=True, pcg=4):
        opts = BAOptions(iters=iters, lambda0=1e-2, tol=0.0, adapt=adapt,
                         pcg_iters=pcg)
        st, pts, info = solve_ba(states, points, prob, kf_dof, mp_free, eye,
                                 z3, cam, opts)
        return float(np.asarray(info["final_chi2"]))

    for label, kw in (("full iter (adapt, pcg4)", {}),
                      ("no accept/reject", dict(adapt=False)),
                      ("pcg 0", dict(pcg=0)),
                      ("pcg 2", dict(pcg=2))):
        t2 = timeit(lambda kw=kw: solve_n(2, **kw))
        t8 = timeit(lambda kw=kw: solve_n(8, **kw))
        print(f"{label:28s} per-iter {(t8 - t2) / 6:6.2f} ms "
              f"(2it {t2:6.1f} / 8it {t8:6.1f})", file=sys.stderr)

    # compute_all / chi2_only alone, slope-timed through lax.scan chains
    opts = BAOptions(iters=1, lambda0=1e-2, tol=0.0)

    def chain(fn, n):
        def body(c, _):
            out = fn()
            s = jax.tree.reduce(
                lambda a, x: a + jnp.sum(x).astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.number) else a,
                out, jnp.float32(0))
            return c + s * 1e-20, None
        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    ca = lambda: _compute_all(states, points, prob, cam, eye, z3, opts,
                              kf_dof, mp_free)[:6]
    c2 = lambda: _chi2_only(states, points, prob, cam, eye, z3, opts)
    for label, fn in (("_compute_all", ca), ("_chi2_only", c2)):
        j1 = jax.jit(lambda: chain(fn, 1))
        j9 = jax.jit(lambda: chain(fn, 9))
        float(j1()); float(j9())
        t1 = timeit(lambda: float(j1()))
        t9 = timeit(lambda: float(j9()))
        print(f"{label:28s} per-call {(t9 - t1) / 8:6.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
