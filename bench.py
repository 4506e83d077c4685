"""Benchmark: per-frame front-end + pose-optimization + amortized local-BA
cost on the real TPU chip, at steady-state throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}
(per-stage breakdown goes to stderr).

Baseline: the reference (RTX 4070) sustains 20 fps playback (50 ms/frame,
try_euroc.cpp:144); the rebuild target is 4x playback = 12.5 ms/frame of
front-end + BA (BASELINE.md). vs_baseline = 12.5 / measured_ms (>= 1.0 means
the 4x-speed target is met).

Methodology (this harness runs over a tunneled TPU where each dispatch
round trip serializes at ~25 ms, D2H runs ~33 MB/s, and D2H serializes
with device compute — see .claude/skills/verify/SKILL.md): every stage is
measured at BATCHED steady-state throughput, the deployment shape for
faster-than-dispatch-rate playback. Stages:
  * front-end: PPGExtractor.extract_batch_async (one dispatch + ONE packed
    byte-buffer fetch per 32 frames; bf16 convs, int8 descriptor
    transfer), pipelined so upload/compute/fetch of adjacent batches
    overlap; median over batches;
  * pose optimization: 32 independent per-frame pose-only LM problems
    (512 obs each) in one dispatch (vmap), median over batches;
  * local BA: solve_ba on a reference-shaped local window (16 KFs / 1024
    points / 8k obs / 512 colines, 6 iterations) with one solve always in
    flight, amortized over the ~8-frame keyframe interval (reference: KF
    every >= 0.1 s, Tracking.cpp:913-941, at 20 fps input).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_frames(n=16):
    rng = np.random.RandomState(0)
    frames = []
    for _ in range(n):
        img = np.full((480, 752), 120, np.uint8)
        for i in range(1, 10):
            img[i * 48 - 1, :] = 250
        for j in range(1, 15):
            img[:, j * 50 - 1] = 250
        img = np.clip(
            img.astype(np.int32) + rng.randint(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        frames.append(img)
    return frames


def bench_frontend(B=32, n_batches=16, depth=3):
    """Depth-3 pipelined front-end: batch k+1 uploads and batch k computes
    while batch k-1's D2H drains and finalizes on host — the tunnel link
    (~40 MB/s each way) fully overlaps the device program. Serving config:
    bf16 convs (f32 accumulation), int8 descriptor transfer with
    per-descriptor scales (component error ~1e-3, keypoint/edge decisions
    identical to f32 — see tests/test_extractor.py)."""
    from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
    from ppg_slam_tpu.frontend import PPGExtractor

    cam = CameraModel(
        kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
        width=752, height=480)
    ex = PPGExtractor(cam, desc_transfer="i8", compute_dtype="bf16")
    frames = make_frames(B)
    feats = ex.extract_batch(frames)  # compile
    assert feats[0].n_kp > 100 and len(feats[0].edges) > 50

    # depth-N batch pipeline (a worker-thread finalize overlap was tried
    # and measured WORSE: the single-core host + client-side lock
    # serialize the worker's fetch against the main thread's dispatch)
    pend = []
    for _ in range(depth - 1):
        pend.append(ex.extract_batch_async(frames))
    times = []
    for i in range(n_batches):
        t0 = time.perf_counter()
        pend.append(ex.extract_batch_async(frames))
        feats = pend.pop(0).result()
        assert len(feats) == B
        times.append(time.perf_counter() - t0)
    for h in pend:
        h.result()
    return float(np.median(times)) / B * 1e3


def bench_pose_opt(B=32, n_obs=512, n_batches=8):
    import jax
    import jax.numpy as jnp

    from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
    from ppg_slam_tpu.estimator import pose_optimization

    cam = CameraModel(kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215,
                      cy=248.375, dist=(0.0, 0.0, 0.0, 0.0),
                      width=752, height=480)
    rng = np.random.RandomState(1)
    X = np.stack([rng.uniform(-2, 2, (B, n_obs)),
                  rng.uniform(-1.5, 1.5, (B, n_obs)),
                  rng.uniform(4, 8, (B, n_obs))], -1).astype(np.float32)
    uv = np.stack([458.654 * X[..., 0] / X[..., 2] + 367.215,
                   457.296 * X[..., 1] / X[..., 2] + 248.375], -1)
    uv += rng.randn(*uv.shape).astype(np.float32) * 0.5
    R0 = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t0_ = rng.randn(B, 3).astype(np.float32) * 0.05
    valid = np.ones((B, n_obs), bool)

    # uniform dense problems vectorize well under vmap (unlike the
    # front-end's compaction-heavy program, which prefers lax.map)
    step = jax.jit(jax.vmap(
        lambda R, t, Xs, uvs, vs: pose_optimization(R, t, Xs, uvs, vs, cam)))
    args = tuple(jnp.asarray(a) for a in
                 (R0, t0_, X, uv.astype(np.float32), valid))
    out = step(*args)
    n_in = int(np.asarray(out[3])[0])
    assert n_in > n_obs * 0.8, n_in

    times = []
    for _ in range(n_batches):
        t0 = time.perf_counter()
        out = step(*args)
        float(np.asarray(out[3])[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / B * 1e3


def bench_lba(n_kf=16, n_mp=1024, n_obs=8192, n_col=512, iters=6,
              n_runs=5, kf_interval=8):
    import jax
    import jax.numpy as jnp

    from ppg_slam_tpu.geometry import so3
    from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
    from ppg_slam_tpu.estimator import (BAOptions, KFStates, empty_problem,
                                        solve_ba)

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
    Xc = np.einsum("oij,oj->oi",
                   Rwb[r_kf].transpose(0, 2, 1), points[r_mp] - twb[r_kf])
    r_uv = np.stack([458.654 * Xc[:, 0] / Xc[:, 2] + 367.215,
                     457.296 * Xc[:, 1] / Xc[:, 2] + 248.375], 1)
    r_uv += rng.randn(n_obs, 2).astype(np.float32) * 0.5

    prob = empty_problem(n_obs=n_obs, n_col=n_col, n_links=1, n_priors=1,
                         n_bp=1)
    # coline slots sized like a real window; invalid (random triplets are
    # not collinear) — zero-weighted but they still flow through the same
    # padded compute, so the cost is representative
    c_idx = rng.randint(0, n_mp, (n_col, 3)).astype(np.int32)
    prob = prob._replace(
        r_kf=jnp.asarray(r_kf), r_mp=jnp.asarray(r_mp),
        r_uv=jnp.asarray(r_uv.astype(np.float32)),
        r_valid=jnp.ones(n_obs, bool),
        c_idx=jnp.asarray(c_idx), c_w=jnp.full((n_col,), 50.0, jnp.float32),
        c_valid=jnp.zeros(n_col, bool))

    tn = twb + rng.randn(n_kf, 3).astype(np.float32) * 0.02
    tn[:2] = twb[:2]
    pn = points + rng.randn(n_mp, 3).astype(np.float32) * 0.02
    states = KFStates(R=jnp.asarray(Rwb), t=jnp.asarray(tn),
                      v=jnp.zeros((n_kf, 3), jnp.float32),
                      bg=jnp.zeros((n_kf, 3), jnp.float32),
                      ba=jnp.zeros((n_kf, 3), jnp.float32))
    kf_dof = np.zeros((n_kf, 15), bool)
    kf_dof[2:, :6] = True
    opts = BAOptions(iters=iters, lambda0=1e-2)
    args = (states, jnp.asarray(pn), prob, jnp.asarray(kf_dof),
            jnp.ones(n_mp, bool), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), cam, opts)
    st, pts, info = solve_ba(*args)
    chi2 = np.asarray(info["chi2_hist"])
    assert chi2[-1] < chi2[0], chi2

    # steady-state throughput: keep one solve in flight (the mapping
    # thread pipelines behind tracking in the reference and here — the
    # per-dispatch link round trip overlaps the previous solve's compute)
    pend = solve_ba(*args)
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        nxt = solve_ba(*args)
        float(np.asarray(pend[2]["chi2_hist"])[-1])
        pend = nxt
        times.append(time.perf_counter() - t0)
    float(np.asarray(pend[2]["chi2_hist"])[-1])
    return float(np.median(times)) * 1e3, kf_interval


def main() -> None:
    fe = bench_frontend()
    log(f"front-end (batch-32 pipelined, bf16+i8): {fe:.2f} ms/frame")
    po = bench_pose_opt()
    log(f"pose optimization (batch-32, 512 obs): {po:.2f} ms/frame")
    lba, kf_int = bench_lba()
    log(f"local BA (16 KF/1k MP/8k obs, {lba:.1f} ms/solve steady-state, KF every "
        f"{kf_int} frames): {lba / kf_int:.2f} ms/frame amortized")

    total = fe + po + lba / kf_int
    print(json.dumps({
        "metric": "frontend_pose_lba_ms_per_frame",
        "value": round(total, 3),
        "unit": "ms",
        "vs_baseline": round(12.5 / total, 3),
    }))


if __name__ == "__main__":
    main()
