"""Front-end profiler on the current backend (run on the real TPU):
per-sub-op device times at batch-32 (slope-timed fori_loop chains inside one
jit — `block_until_ready` does not truly block over the tunnel), plus the
pipelined wall time and device-output statistics that size the transfer
buckets (n_kp / n_cand / rate-passing counts)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ppg_slam_tpu.frontend import PPGExtractor
from ppg_slam_tpu.geometry.cameras import (CAM_FISHEYE, CAM_PINHOLE,
                                           CameraModel)
from ppg_slam_tpu.models import load_params, ppg_forward
from ppg_slam_tpu.ops.heatmap import refine_heatmap
from ppg_slam_tpu.ops.nms import nms_keypoints
from ppg_slam_tpu.ops.pairs import probe_and_select, validate_candidates
from ppg_slam_tpu.ops.sampling import band_params, remap_banded

# PPG_PROFILE_SHAPE selects the bench bucket: euroc (default, 752x480
# pinhole B=32) or tumvi1024 (1024x1024 KB8 B=16 — the over-budget bucket,
# VERDICT r4 #6)
_SHAPE = __import__("os").environ.get("PPG_PROFILE_SHAPE", "euroc")
if _SHAPE == "tumvi1024":
    _s = 2.0
    cam = CameraModel(
        kind=CAM_FISHEYE, fx=190.978477 * _s, fy=190.973307 * _s,
        cx=254.931706 * _s, cy=256.897442 * _s,
        dist=(0.003482389402, 0.000715034845, -0.002053236141,
              0.000202936736),
        width=1024, height=1024)
    B = 16
else:
    cam = CameraModel(kind=CAM_PINHOLE, fx=458.654, fy=457.296, cx=367.215,
                      cy=248.375,
                      dist=(-0.28340811, 0.07395907, 0.00019359,
                            1.76187114e-05),
                      width=752, height=480)
    B = 32


def make_frames(n=B):
    rng = np.random.RandomState(0)
    h, w = cam.height, cam.width
    out = []
    for _ in range(n):
        img = np.full((h, w), 120, np.uint8)
        for i in range(1, 10):
            img[i * (h // 10) - 1, :] = 250
        for j in range(1, 15):
            img[:, j * (w // 15) - 1] = 250
        out.append(np.clip(img.astype(np.int32)
                           + rng.randint(-20, 20, img.shape), 0,
                           255).astype(np.uint8))
    return np.stack(out)


def slope_time(fn, args, iters=8, label=""):
    """Wall time per call via an N-iteration chain inside ONE jit (the
    tunnel serializes fetches; chaining isolates device compute).

    Each iteration's input is perturbed by carry * 1e-30 (an effective
    zero XLA cannot prove is zero) — without the data dependency the
    compiler hoists fn out of the fori_loop and every iteration after the
    first is free (measured: all-zero slopes)."""
    import jax.tree_util as jtu

    leaves0, _ = jtu.tree_flatten(args)
    fi = next((i for i, x in enumerate(leaves0)
               if hasattr(x, "dtype")
               and jnp.issubdtype(x.dtype, jnp.inexact)), None)

    def chain(n_static, *a):
        lv, td = jtu.tree_flatten(a)

        def body(i, carry):
            l2 = list(lv)
            if fi is not None:
                eps = (carry * jnp.float32(1e-30)).astype(l2[fi].dtype)
                l2[fi] = l2[fi] + eps
            out = fn(*jtu.tree_unflatten(td, l2))
            # fold a scalar from the output back in to serialize iterations
            s = jax.tree.reduce(
                lambda acc, x: acc + jnp.sum(x).astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.number) else acc,
                out, jnp.float32(0))
            return carry + s * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, n_static, body, jnp.float32(0))

    j1 = jax.jit(lambda *a: chain(1, *a))
    jN = jax.jit(lambda *a: chain(iters, *a))
    float(j1(*args))
    float(jN(*args))
    t1 = time.perf_counter(); float(j1(*args)); t1 = time.perf_counter() - t1
    tN = time.perf_counter(); float(jN(*args)); tN = time.perf_counter() - tN
    per = (tN - t1) / (iters - 1)
    print(f"{label:34s} {per * 1e3 / B:7.3f} ms/frame "
          f"({per * 1e3:7.1f} ms/batch)", file=sys.stderr, flush=True)
    return per


def main():
    params = load_params()
    frames = jnp.asarray(make_frames())
    ex = PPGExtractor(cam, desc_transfer="device", compute_dtype="bf16")
    dt = jnp.bfloat16

    imgs = frames.astype(jnp.float32)[..., None] / 255.0

    from ppg_slam_tpu.models.ppg_net import (backbone_apply, descriptor_apply,
                                             heatmap_apply, junction_apply)

    feat = jax.jit(lambda p, x: backbone_apply(p, x, dtype=dt))(params, imgs)
    jax.block_until_ready(feat)

    slope_time(lambda p, x: backbone_apply(p, x, dtype=dt), (params, imgs),
               label="nets: backbone")
    slope_time(lambda p, f: junction_apply(p, f, dtype=dt), (params, feat),
               label="nets: junction head")
    slope_time(lambda p, f: heatmap_apply(p, f, dtype=dt), (params, feat),
               label="nets: heatmap head")
    slope_time(lambda p, f: descriptor_apply(p, f, dtype=dt), (params, feat),
               label="nets: descriptor head")
    slope_time(lambda p, x: ppg_forward(p, x, dtype=dt)["heat"],
               (params, imgs), label="nets: full forward")

    fwd = jax.jit(lambda p, x: ppg_forward(p, x, dtype=dt))(params, imgs)
    junc, heat, desc = (fwd["junc_prob"], fwd["heat"], fwd["desc"])
    jax.block_until_ready(heat)

    def per_frame(fn):
        return lambda *a: jax.lax.map(lambda x: fn(*x), a)

    slope_time(per_frame(lambda j: nms_keypoints(j)[1]), (junc,),
               label="decode: NMS")
    slope_time(per_frame(lambda h: refine_heatmap(h)), (heat,),
               label="decode: heat refine")

    rmap = np.asarray(cam.undistort_rectify_map(), np.float32)
    lo, band, col_lo, src_w = band_params(rmap[..., 0], rmap[..., 1])
    mapx = jnp.asarray(np.ascontiguousarray(rmap[..., 0]))
    mapy = jnp.asarray(np.ascontiguousarray(rmap[..., 1]))
    loj = jnp.asarray(lo)
    colj = jnp.asarray(col_lo)
    rh = jax.jit(per_frame(lambda h: refine_heatmap(h)))(heat)
    jax.block_until_ready(rh)
    slope_time(per_frame(
        lambda h: remap_banded(h, mapx, mapy, loj, band, colj, src_w)),
        (rh,), label="decode: banded remap")

    # keypoints for probe/validate stages
    def kp_stage(j):
        kp_xy, kp_score, kp_valid = nms_keypoints(j)
        kp_un = cam.undistort_points(kp_xy.astype(jnp.float32))
        ok = kp_valid & (kp_un[:, 0] >= 1) & (kp_un[:, 0] < cam.width - 1) \
            & (kp_un[:, 1] >= 1) & (kp_un[:, 1] < cam.height - 1)
        return kp_un, ok

    kps = jax.jit(per_frame(kp_stage))(junc)
    heat_un = jax.jit(per_frame(
        lambda h: remap_banded(h, mapx, mapy, loj, band, colj, src_w)))(rh)
    jax.block_until_ready((kps, heat_un))
    kp_un_b, ok_b = kps

    slope_time(per_frame(lambda h, k, o: probe_and_select(h, k, o)["n_cand"]),
               (heat_un, kp_un_b, ok_b), label="decode: pair probe+select")

    sel = jax.jit(per_frame(lambda h, k, o: probe_and_select(h, k, o)))(
        heat_un, kp_un_b, ok_b)
    jax.block_until_ready(sel)

    def val_stage(h, k, ci, cj, cv):
        d = jnp.sqrt(jnp.sum((k[cj] - k[ci]) ** 2, -1))
        return validate_candidates(h, k, ci, cj, d, cv)[0]

    slope_time(per_frame(val_stage),
               (heat_un, kp_un_b, sel["ci"].astype(jnp.int32),
                sel["cj"].astype(jnp.int32), sel["cand_valid"]),
               label="decode: line validation")

    from ppg_slam_tpu.ops.descriptors import sample_descriptors

    kp_xy_b = jax.jit(per_frame(lambda j: nms_keypoints(j)[0]
                                .astype(jnp.float32)))(junc)
    kv_b = jax.jit(per_frame(lambda j: nms_keypoints(j)[2]))(junc)
    jax.block_until_ready((kp_xy_b, kv_b))
    slope_time(per_frame(
        lambda d, k, v: sample_descriptors(d, k, v, cam.width, cam.height)),
        (desc, kp_xy_b, kv_b), label="decode: descriptor sampling")

    # ---- device-output statistics (transfer-bucket sizing) -------------
    fr_list = [np.asarray(f) for f in np.asarray(frames)]
    feats = ex.extract_batch(fr_list)
    raw = np.asarray(ex.extract_batch_async(fr_list)._buf)
    stats = [ex._unpack(raw[b]) for b in range(B)]
    print("per-frame stats over the bench batch:", file=sys.stderr)
    nk = [f.n_kp for f in feats]
    ne = [len(f.edges) for f in feats]
    nc = [int(s["n_cand"]) for s in stats]
    ng = [int(np.sum(np.unpackbits(s["good_bits"],
                                   bitorder="little")[: int(s["n_cand"])]))
          for s in stats]
    print(f"  n_kp:   min {min(nk)} med {int(np.median(nk))} max {max(nk)}",
          file=sys.stderr)
    print(f"  edges:  min {min(ne)} med {int(np.median(ne))} max {max(ne)}",
          file=sys.stderr)
    print(f"  n_cand: min {min(nc)} med {int(np.median(nc))} max {max(nc)} "
          f"(cap 4096)", file=sys.stderr)
    print(f"  good:   min {min(ng)} med {int(np.median(ng))} max {max(ng)}",
          file=sys.stderr)

    # pipelined wall per frame (the bench's front-end number)
    fr = [np.asarray(f) for f in np.asarray(frames)]
    pend = [ex.extract_batch_async(fr) for _ in range(2)]
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        pend.append(ex.extract_batch_async(fr))
        pend.pop(0).result()
        ts.append(time.perf_counter() - t0)
    for h in pend:
        h.result()
    print(f"pipelined wall: {np.median(ts) / B * 1e3:.2f} ms/frame",
          file=sys.stderr)


if __name__ == "__main__":
    main()
