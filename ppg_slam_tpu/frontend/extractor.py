"""The PPG front-end: ONE device program per frame + tiny native host finish.

TPU-native reorganization of the reference PPGExtractor::run
(/root/reference/feature/src/PPGExtractor.cpp:118-147). The reference does
4 CUDA forwards + CPU post-processing; here EVERYTHING data-parallel runs in
one jitted XLA program:

  nets -> junction decode -> NMS (iterated maxpool) -> keypoint undistortion
  -> heatmap tile refine -> undistortion remap (banded one-hot matmuls)
  -> all-pairs 3-probe gate (one-hot matmul sampling) -> candidate compaction
  -> per-candidate geometry -> sampled line validation (flat pool)
  -> MXU one-hot descriptor sampling

and only the inherently-sequential greedy suppression + coline extraction run
on host (native C++, ~0.5 ms), consuming host-recomputed candidate geometry —
the heat map never leaves the device. Per frame: ONE dispatch and ONE packed
device->host byte buffer (~170 KB with int8 descriptors; every output
bitcast+concatenated on device because each separately fetched array costs a
full link round trip — see _Handle).

`extract_async`/`Handle.result` expose a depth-N pipeline: dispatch+transfer
of frame t+1..t+k overlap the host finish of frame t, hiding device latency —
the throughput analog of the reference's thread overlap. `extract` is the
synchronous wrapper.

Output contract matches the reference run(): keypoints (distorted +
undistorted; pinhole overwrites distorted with undistorted, :141-146),
KeyEdges with lscore, per-point colinear pairs, and 256-d L2-normalized
descriptors.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import CameraModel
from ..models import load_params, ppg_forward
from ..ops.descriptors import sample_descriptors
from ..ops.heatmap import refine_heatmap
from ..ops.nms import MAX_KEYPOINTS, nms_keypoints
from ..ops.pairs import (
    candidate_geometry,
    probe_and_select,
    validate_candidates,
)
from ..ops.sampling import band_params, remap_banded
from .graph_build import finalize_graph, remap_np

MIN_KP_FOR_DESC = 10  # reference quirk: < 10 keypoints -> zero descriptors


@dataclasses.dataclass
class FrameFeatures:
    """Per-frame front-end output (host numpy; the reference's
    mvKeyPoints/mvKeyEdges/descriptor mat)."""

    kp_pos: np.ndarray      # (N, 2) float32 — mPos (== undistorted for pinhole)
    kp_pos_un: np.ndarray   # (N, 2) float32 — mPosUn
    kp_score: np.ndarray    # (N,)
    kp_out: np.ndarray      # (N,) bool — mbOut (outside usable image bounds)
    edges: np.ndarray       # (E, 2) int32 keypoint indices
    edge_score: np.ndarray  # (E,) lscore
    colines: np.ndarray     # (C, 3) int32 (pivot, p1, p2)
    connected: List[List[int]]  # per-keypoint final edge ids
    desc: Optional[np.ndarray]  # (N, 256) float32 L2-normalized; None when
    #                             device-resident (fetch via .descriptors)
    desc_dev: object = None     # device-resident descriptors (desc "device"
    #                             mode): the (MAX_KP, 256) f32 array, or a
    #                             (batch_array, index) pair
    desc_fetch: object = None   # () -> np.ndarray host fetch (i8 transfer)

    @property
    def n_kp(self) -> int:
        return len(self.kp_pos)

    @property
    def descriptors(self) -> np.ndarray:
        """Host descriptors, fetched from the device on first use (one
        ~129 KB i8 transfer — paid only by keyframes and fallback paths in
        the device-matching configuration)."""
        if self.desc is None:
            self.desc = self.desc_fetch()
        return self.desc


class _Handle:
    """In-flight extraction: ONE packed byte buffer en route to host.

    All device outputs are bitcast+concatenated into a single uint8 buffer
    on device: over a tunneled TPU link every separately-fetched array costs
    a full ~25 ms dispatch round trip, so ~15 outputs/frame would spend more
    time on round trips than on the actual bytes. One buffer = one fetch."""

    def __init__(self, extractor: "PPGExtractor", dev_buf, desc_dev=None):
        self._ex = extractor
        self._buf = dev_buf
        self._desc_dev = desc_dev
        try:
            dev_buf.copy_to_host_async()
        except Exception:
            pass

    def result(self) -> FrameFeatures:
        buf = np.asarray(self._buf)
        return self._ex._finish(self._ex._unpack(buf),
                                desc_dev=self._desc_dev)


class _BatchHandle:
    """In-flight batched extraction (one (B, BYTES) uint8 fetch)."""

    def __init__(self, extractor: "PPGExtractor", dev_buf, n: int,
                 desc_dev=None):
        self._ex = extractor
        self._buf = dev_buf
        self._n = n
        self._desc_dev = desc_dev
        try:
            dev_buf.copy_to_host_async()
        except Exception:
            pass

    def result(self) -> List[FrameFeatures]:
        host = np.asarray(self._buf)
        return [
            self._ex._finish(
                self._ex._unpack(host[b]),
                desc_dev=(None if self._desc_dev is None
                          else (self._desc_dev, b)))
            for b in range(self._n)
        ]


class PPGExtractor:
    """Per-camera fused front-end. Thread-compatible with the tracking loop."""

    def __init__(self, camera: CameraModel, weights_path: Optional[str] = None,
                 max_kp: int = MAX_KEYPOINTS, desc_transfer: str = "f32",
                 compute_dtype: str = "f32"):
        """desc_transfer: "f32" (exact, default), "f16" (halves the per-frame
        device->host payload; ~5e-4 descriptor error, far below the 0.7/0.8
        matching thresholds), "i8" (quarter payload; per-descriptor scale
        quantization, ~2e-3 component error — see tests/test_extractor.py
        desc-quantization test), "device" (descriptors stay device-resident
        for device-side gated matching — matching/device_match.py — with an
        on-demand i8 host fetch for keyframes/fallbacks), or "none" (drop
        them; front-end-only serving)."""
        assert desc_transfer in ("f32", "f16", "i8", "none", "device")
        assert compute_dtype in ("f32", "bf16")
        self.camera = camera
        self.max_kp = max_kp
        self.desc_transfer = desc_transfer
        self.compute_dtype = compute_dtype
        self.params = load_params(weights_path) if weights_path else load_params()
        self._has_dist = any(abs(d) > 0 for d in camera.dist)
        if self._has_dist:
            rmap = np.asarray(camera.undistort_rectify_map(), np.float32)
            self._remap_xy = np.ascontiguousarray(rmap)
            lo, band, col_lo, src_w = band_params(rmap[..., 0],
                                                  rmap[..., 1])
            self._band_lo = jnp.asarray(lo)
            self._band = band
            self._col_lo = jnp.asarray(col_lo)
            self._src_w = src_w
            self._mapx = jnp.asarray(np.ascontiguousarray(rmap[..., 0]))
            self._mapy = jnp.asarray(np.ascontiguousarray(rmap[..., 1]))
        else:
            self._remap_xy = None

        cam = camera
        w, h = cam.width, cam.height
        has_dist = self._has_dist
        band = self._band if has_dist else 0
        src_w = self._src_w if has_dist else 0
        desc_mode = desc_transfer
        is_fisheye = camera.is_fisheye
        net_dtype = jnp.bfloat16 if compute_dtype == "bf16" else None

        def nets(params, images_u8):
            """Batched CNN forwards: convs batch natively on the MXU (weight
            reuse across frames), unlike the decode below which lax.maps."""
            imgs = images_u8.astype(jnp.float32)[..., None] / 255.0
            out = ppg_forward(params, imgs, dtype=net_dtype)
            return out["junc_prob"], out["heat"], out["desc"]

        def decode(junc, heat, desc_map, mapx, mapy, band_lo, col_lo):
            kp_xy, kp_score, kp_valid = nms_keypoints(junc, max_kp=max_kp)
            kp_pos = kp_xy.astype(jnp.float32)
            kp_un = cam.undistort_points(kp_pos)
            in_img = (
                (kp_un[:, 0] >= 1) & (kp_un[:, 0] < w - 1)
                & (kp_un[:, 1] >= 1) & (kp_un[:, 1] < h - 1)
            )
            kp_ok = kp_valid & in_img

            heat = refine_heatmap(heat)
            if has_dist:  # undistort the heat map (cv::remap equivalent)
                heat = remap_banded(heat, mapx, mapy, band_lo, band,
                                    col_lo, src_w)

            sel = probe_and_select(heat, kp_un, kp_ok)
            dist_c, ang_ab, ang_ba = candidate_geometry(
                kp_un, sel["ci"], sel["cj"])
            good, lscore, overflow = validate_candidates(
                heat, kp_un, sel["ci"], sel["cj"], dist_c, sel["cand_valid"])

            # candidate geometry (dist/ang) is NOT transferred: it is a pure
            # function of kp_un + ci/cj, recomputed on host in _finish —
            # the D2H link (~30-40 MB/s through the tunnel) is the front-end
            # bottleneck, so only device-only information ships, packed:
            #   * (ci, cj) -> v = ci + 512*cj < 2^18 in THREE bytes (vs 4);
            #   * good -> bit-packed (1 bit/candidate, little-endian);
            #   * lscore -> f16 ([0,1] weights; 3 significant digits is far
            #     inside the harmonic edge-weight tolerance).
            assert max_kp <= 512  # 18-bit (ci, cj) packing bound
            v = sel["ci"].astype(jnp.int32) + 512 * sel["cj"].astype(
                jnp.int32)
            cand_packed = jnp.stack([
                (v & 255).astype(jnp.uint8),
                ((v >> 8) & 255).astype(jnp.uint8),
                (v >> 16).astype(jnp.uint8),
            ])
            bit_w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
            good_bits = jnp.sum(
                good.reshape(-1, 8).astype(jnp.int32) * bit_w[None, :],
                axis=1).astype(jnp.uint8)
            out = dict(
                kp_score=kp_score, n_kp=jnp.sum(kp_valid),
                kp_un=kp_un, kp_ok=kp_ok,
                cand_packed=cand_packed, good_bits=good_bits,
                n_cand=sel["n_cand"],
                lscore=lscore.astype(jnp.float16),
                saturated=sel["saturated"] | overflow,
            )
            if is_fisheye:  # pinhole: mPos is overwritten by mPosUn anyway
                out["kp_pos"] = kp_pos
            desc_dev = None
            if desc_mode == "device":
                descs = sample_descriptors(desc_map, kp_pos, kp_valid, w, h)
                # reference <10-keypoint zeroing quirk applied on device so
                # device-side matching sees the same descriptors the host
                # fetch returns (genPointDescriptor, PPGExtractor.cpp:515)
                desc_dev = jnp.where(jnp.sum(kp_valid) >= MIN_KP_FOR_DESC,
                                     descs, jnp.zeros_like(descs))
            elif desc_mode != "none":
                descs = sample_descriptors(desc_map, kp_pos, kp_valid, w, h)
                if desc_mode == "f32":
                    out["descs"] = descs
                elif desc_mode == "f16":
                    out["descs"] = descs.astype(jnp.float16)
                else:  # i8: per-descriptor max-abs scale quantization
                    scale = jnp.maximum(jnp.max(jnp.abs(descs), axis=1),
                                        1e-8)
                    q = jnp.clip(jnp.round(descs / scale[:, None] * 127.0),
                                 -127, 127).astype(jnp.int8)
                    out["descs"] = q
                    out["desc_scale"] = scale.astype(jnp.float16)
            return out, desc_dev

        def stage(params, image_u8, mapx, mapy, band_lo, col_lo):
            junc, heat, dm = nets(params, image_u8[None])
            return decode(junc[0], heat[0], dm[0], mapx, mapy, band_lo,
                          col_lo)[0]

        # ---- single-buffer output packing -----------------------------
        # Layout derived once via eval_shape so device pack and host unpack
        # can never drift; canonical ordering = sorted key names.
        ex_img = jax.ShapeDtypeStruct((cam.height, cam.width), jnp.uint8)
        ex_map = (jax.ShapeDtypeStruct(self._mapx.shape, self._mapx.dtype)
                  if has_dist else None)
        ex_lo = (jax.ShapeDtypeStruct(self._band_lo.shape,
                                      self._band_lo.dtype)
                 if has_dist else None)
        ex_col = (jax.ShapeDtypeStruct(self._col_lo.shape,
                                       self._col_lo.dtype)
                  if has_dist else None)
        out_shapes = jax.eval_shape(stage, self.params, ex_img, ex_map,
                                    ex_map, ex_lo, ex_col)
        layout = []
        off = 0
        for name in sorted(out_shapes):
            s = out_shapes[name]
            np_dtype = np.dtype(np.uint8 if s.dtype == jnp.bool_
                                else s.dtype)
            nb = int(np.prod(s.shape, dtype=np.int64)) * np_dtype.itemsize
            layout.append((name, np_dtype, tuple(s.shape),
                           s.dtype == jnp.bool_, off, nb))
            off += nb
        self._layout = layout
        self._packed_bytes = off

        def pack(out: dict) -> jnp.ndarray:
            parts = []
            for name in sorted(out):
                x = out[name]
                if x.dtype == jnp.bool_:
                    x = x.astype(jnp.uint8)
                if x.dtype != jnp.uint8:
                    x = jax.lax.bitcast_convert_type(x, jnp.uint8)
                parts.append(x.reshape(-1))
            return jnp.concatenate(parts)

        dev_desc = desc_transfer == "device"

        def stage_packed(params, image_u8, mapx, mapy, band_lo, col_lo):
            junc, heat, dm = nets(params, image_u8[None])
            out, dd = decode(junc[0], heat[0], dm[0], mapx, mapy, band_lo,
                             col_lo)
            return (pack(out), dd) if dev_desc else pack(out)

        self._stage = jax.jit(stage_packed)

        # batched variant: frames stack on a leading axis; ONE dispatch per
        # batch amortizes dispatch/transfer overheads (crucial over tunneled
        # TPU links where each dispatch round trip serializes at ~30 ms).
        # The CNN forwards batch natively (one conv over (B, H, W, 1) — MXU
        # weight reuse); the decode tail runs under lax.map (not vmap): it
        # is already MXU-saturating per frame, and vmap lowers its one-hot
        # scan chunks/compactions pathologically (~10x).
        def stage_batch(params, images, mapx, mapy, band_lo, col_lo):
            junc, heat, dm = nets(params, images)

            def per_frame(x):
                out, dd = decode(x[0], x[1], x[2], mapx, mapy, band_lo,
                                 col_lo)
                return (pack(out), dd) if dev_desc else pack(out)

            return jax.lax.map(per_frame, (junc, heat, dm))

        self._stage_batch = jax.jit(stage_batch)

        # data-parallel batched variant over a device mesh (multi-chip
        # scale-out, SURVEY §2.8: DP front-end for offline mapping /
        # multi-camera rigs / faster-than-realtime playback). shard_map,
        # not GSPMD sharding: the decode tail is a lax.map *scan* whose
        # scanned axis cannot be partitioned across devices — instead each
        # device runs the whole batched stage on its local shard of the
        # frame batch (embarrassingly parallel; no collectives).
        self._stage_batch_py = stage_batch
        self._dp_programs: dict = {}

        # keyframe-rate host descriptor fetch (device desc mode): ONE i8
        # packed buffer per requested frame
        if dev_desc:
            from ..ops.device_match import quantize_desc_i8

            self._fetch_desc_prog = jax.jit(quantize_desc_i8)
            self._fetch_desc_batch_prog = jax.jit(
                lambda d, b: quantize_desc_i8(
                    jax.lax.dynamic_index_in_dim(d, b, 0, keepdims=False)))
            # keyframe-rate fetch for a whole frame-batch in ONE program /
            # ONE host fetch: every separately-drained buffer costs a full
            # link round trip on tunneled TPUs (~25 ms each, profiled)
            self._fetch_desc_strided_prog = jax.jit(
                lambda d, idx: jax.vmap(quantize_desc_i8)(d[idx]))

    def fetch_desc_strided(self, desc_dev_batch, stride: int):
        """Quantized host fetch of every stride-th frame's descriptors from
        a batched device descriptor array — one dispatch + one buffer."""
        idx = jnp.arange(0, desc_dev_batch.shape[0], stride)
        return self._fetch_desc_strided_prog(desc_dev_batch, idx)

    def _unpack(self, buf: np.ndarray) -> dict:
        """Zero-copy views into one fetched per-frame byte buffer."""
        out = {}
        for name, np_dtype, shape, is_bool, off, nb in self._layout:
            v = buf[off:off + nb].view(np_dtype).reshape(shape)
            out[name] = v.view(np.bool_) if is_bool else v
        return out

    def warmup(self) -> None:
        """Compile the device program (the reference warms its CUDA nets
        similarly, PPGExtractor.cpp:98-107)."""
        img = np.ones((self.camera.height, self.camera.width), np.uint8)
        self.extract(img)

    # -- pipeline API ---------------------------------------------------
    def extract_async(self, image_u8: np.ndarray) -> _Handle:
        assert image_u8.ndim == 2, "single-channel images only"
        if self._has_dist:
            out = self._stage(self.params, jnp.asarray(image_u8),
                              self._mapx, self._mapy, self._band_lo,
                              self._col_lo)
        else:
            out = self._stage(self.params, jnp.asarray(image_u8),
                              None, None, None, None)
        if self.desc_transfer == "device":
            return _Handle(self, out[0], desc_dev=out[1])
        return _Handle(self, out)

    def extract(self, image_u8: np.ndarray) -> FrameFeatures:
        return self.extract_async(image_u8).result()

    def extract_batch(self, images: List[np.ndarray],
                      mesh=None) -> List[FrameFeatures]:
        """Extract a batch of frames in ONE device dispatch (vmapped stage).

        Throughput path: the front-end is a pure per-frame function, so
        frames batch freely (multi-camera rigs, offline mapping, and
        playback faster than the per-dispatch link latency allows). Live
        tracking consumes results in order, one batch behind.

        mesh: an optional `jax.sharding.Mesh` with a "dp" axis — the batch
        is sharded over it, one local sub-batch per device (multi-chip DP
        scale-out; results are identical to the single-device path).
        """
        return self.extract_batch_async(images, mesh=mesh).result()

    def _dp_stage(self, mesh):
        """shard_map-wrapped batched stage for a mesh, cached per mesh."""
        prog = self._dp_programs.get(mesh)
        if prog is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            dp = mesh.axis_names[0]
            # check_vma off: the stage is per-frame pure (no collectives),
            # and the decode's lax.cond branches mix device-varying and
            # replicated values that the varying-axis analysis rejects.
            prog = jax.jit(shard_map(
                self._stage_batch_py, mesh=mesh,
                in_specs=(P(), P(dp), P(), P(), P(), P()),
                out_specs=P(dp), check_vma=False))
            self._dp_programs[mesh] = prog
        return prog

    def extract_batch_async(self, images,
                            mesh=None) -> "_BatchHandle":
        """images: a list of (H, W) uint8 host frames, or an already
        device-resident (B, H, W) uint8 `jax.Array` (pre-staged feed — the
        upload then rides whatever pipeline the caller arranged)."""
        if isinstance(images, jax.Array):
            stack = images
            n_images = int(stack.shape[0])
        else:
            stack = jnp.asarray(np.stack(images))
            n_images = len(images)
        assert stack.ndim == 3, "batch of single-channel images"
        if mesh is not None:
            pad = (-n_images) % mesh.size
            if pad:  # fixed per-device shape: repeat the tail frame
                stack = jnp.concatenate(
                    [stack, jnp.repeat(stack[-1:], pad, axis=0)])
            prog = self._dp_stage(mesh)
        else:
            prog = self._stage_batch
        if self._has_dist:
            out = prog(self.params, stack, self._mapx,
                       self._mapy, self._band_lo, self._col_lo)
        else:
            out = prog(self.params, stack, None, None, None,
                       None)
        if self.desc_transfer == "device":
            return _BatchHandle(self, out[0], n_images, desc_dev=out[1])
        return _BatchHandle(self, out, n_images)

    # -- host finish ------------------------------------------------------
    def fetch_descriptors(self, desc_dev, n_kp: int) -> np.ndarray:
        """Pull one frame's device-resident descriptors to host (i8 packed
        transfer, dequantized; the <10-kp quirk is already applied on
        device). desc_dev: a (MAX_KP, 256) array or (batch_array, index)."""
        from ..ops.device_match import dequantize_desc_i8

        if isinstance(desc_dev, tuple):
            arr, b = desc_dev
            buf = np.asarray(self._fetch_desc_batch_prog(arr, b))
        else:
            buf = np.asarray(self._fetch_desc_prog(desc_dev))
        return dequantize_desc_i8(buf, self.max_kp)[:n_kp]

    def _finish(self, a, desc_dev=None) -> FrameFeatures:
        n_kp = int(a["n_kp"])
        n_cand = int(a["n_cand"])
        kp_un = a["kp_un"][:n_kp]
        kp_ok = a["kp_ok"][:n_kp]

        # unpack the 3-byte (ci, cj) pairs and the good bit field
        cp = a["cand_packed"].astype(np.int32)
        v = cp[0] + (cp[1] << 8) + (cp[2] << 16)
        ci_full = (v & 511).astype(np.int32)
        cj_full = (v >> 9).astype(np.int32)
        good = np.unpackbits(a["good_bits"],
                             bitorder="little").view(np.bool_)

        # recompute candidate geometry from kp_un (mirrors the device's
        # ops/pairs.py candidate_geometry; same f32 inputs -> same values)
        ci = ci_full[:n_cand].astype(np.int64)
        cj = cj_full[:n_cand].astype(np.int64)
        kp_all = a["kp_un"]
        d = kp_all[cj] - kp_all[ci]
        dist_c = np.sqrt(np.sum(d * d, axis=-1), dtype=np.float32)
        ang_ab = np.arctan2(d[:, 1], d[:, 0]).astype(np.float32)
        ang_ba = np.arctan2(-d[:, 1], -d[:, 0]).astype(np.float32)
        edges, lscore, colines, connected = finalize_graph(
            ci_full[:n_cand], cj_full[:n_cand], dist_c, ang_ab, ang_ba,
            good[:n_cand],
            a["lscore"][:n_cand], n_kp)

        desc_fetch = None
        if "descs" in a:
            desc_out = a["descs"][:n_kp].astype(np.float32)
            if "desc_scale" in a:  # i8 transfer: dequantize
                desc_out *= (a["desc_scale"][:n_kp].astype(np.float32)
                             / 127.0)[:, None]
            if n_kp < MIN_KP_FOR_DESC:  # reference genPointDescriptor quirk
                desc_out[:] = 0.0
        elif desc_dev is not None:
            desc_out = None  # device-resident; host fetch on demand
            desc_fetch = (lambda dd=desc_dev, n=n_kp:
                          self.fetch_descriptors(dd, n))
        else:
            desc_out = np.zeros((n_kp, 256), np.float32)

        pos_un = kp_un.copy()
        # pinhole: run() overwrites mPos with mPosUn (:141-146)
        pos = a["kp_pos"][:n_kp].copy() if "kp_pos" in a else pos_un.copy()
        return FrameFeatures(
            kp_pos=pos, kp_pos_un=pos_un, kp_score=a["kp_score"][:n_kp].copy(),
            kp_out=~kp_ok, edges=edges, edge_score=lscore,
            colines=colines, connected=connected, desc=desc_out,
            desc_dev=desc_dev, desc_fetch=desc_fetch,
        )

    # -- test/debug helpers ------------------------------------------------
    def _device_outputs(self, image_u8: np.ndarray) -> dict:
        """The raw (host-fetched) device-program outputs; for spec tests."""
        return self._unpack(np.asarray(self.extract_async(image_u8)._buf))

    def device_heat(self, image_u8: np.ndarray) -> np.ndarray:
        """Refined (+remapped) heat as the device program computes it —
        recomputed through the same jitted sub-ops; for spec tests."""
        img = jnp.asarray(image_u8).astype(jnp.float32) / 255.0
        out = ppg_forward(self.params, img[None, :, :, None])
        heat = refine_heatmap(out["heat"][0])
        if self._has_dist:
            heat = remap_banded(heat, self._mapx, self._mapy, self._band_lo,
                                self._band, self._col_lo, self._src_w)
        return np.asarray(heat)

    def remap_heat_host(self, heat: np.ndarray) -> np.ndarray:
        """Heat-map undistortion on host (numpy/native spec; the production
        path remaps on device). Identity when no distortion."""
        if self._remap_xy is None:
            return heat
        from ..native import get_lib

        lib = get_lib()
        if lib is None:
            return remap_np(heat, self._remap_xy)
        import ctypes

        h, w = heat.shape
        out = np.empty_like(heat)
        mapx = np.ascontiguousarray(self._remap_xy[..., 0])
        mapy = np.ascontiguousarray(self._remap_xy[..., 1])
        lib.ppg_remap(
            heat.ctypes.data_as(ctypes.c_void_p),
            mapx.ctypes.data_as(ctypes.c_void_p),
            mapy.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int(h), ctypes.c_int(w),
            out.ctypes.data_as(ctypes.c_void_p))
        return out
