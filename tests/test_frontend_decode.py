"""Decode ops vs pure-python transcriptions of the reference C++ algorithms."""

import numpy as np
import pytest

import jax.numpy as jnp

from ppg_slam_tpu.ops.nms import nms_keypoints
from ppg_slam_tpu.ops.heatmap import refine_heatmap, bilinear_sample
from ppg_slam_tpu.ops.lines import pair_probe_mask, validate_edges

RNG = np.random.RandomState(11)


# ---------------------------------------------------------------------------
# pure-python spec (transcribed from PPGExtractor.cpp — the behavioral oracle)
# ---------------------------------------------------------------------------

def spec_nms(junc, thresh=1 / 128, radius=4, max_kp=500):
    h, w = junc.shape
    pts = [
        (x, y, junc[y, x])
        for y in range(h)
        for x in range(w)
        if junc[y, x] >= thresh
    ]
    pts.sort(key=lambda p: -p[2])
    flag = np.zeros((h, w), np.int8)
    out = []
    for x, y, s in pts:
        if (
            x < radius or x > w - radius - 1
            or y < radius or y > h - radius - 1
            or flag[y, x] != 0
        ):
            continue
        out.append((x, y, s))
        if len(out) + 1 > max_kp:
            break
        flag[max(0, y - radius): y + radius + 1,
             max(0, x - radius): x + radius + 1] = -1
    return out


def spec_refine(heat, ts=16, thresh=1e-2, ratio=0.3):
    out = heat.copy()
    h, w = heat.shape
    for i in range(h // ts):
        for j in range(w // ts):
            tile = out[i * ts:(i + 1) * ts, j * ts:(j + 1) * ts]
            vals = [v for v in tile.flatten() if v > thresh]  # row-major
            val_count = int(ratio * len(vals))
            if val_count < 1:
                continue
            if len(vals) >= ts * ts * 0.9 and vals[int(len(vals) * 0.9)] > 0.1:
                tile[:] = 0
                continue
            svals = sorted(vals, reverse=True)
            ave = float(np.sum(svals[:val_count])) / val_count
            new = np.where(tile > thresh, np.minimum(tile / ave, 1.0), 0.0)
            tile[:] = new
    return out


def spec_bilinear(M, x, y):
    x1, y1 = int(x), int(y)
    x2, y2 = x1 + 1, y1 + 1
    d1 = (x2 - x) * M[y1, x1] + (x - x1) * M[y1, x2]
    d2 = (x2 - x) * M[y2, x1] + (x - x1) * M[y2, x2]
    return (y2 - y) * d1 + (y - y1) * d2


def spec_validate(heat, ps, pe):
    inv_gap = [0.3333, 0.200, 0.1427, 0.1111]
    h, w = heat.shape
    d = float(np.linalg.norm(ps - pe))
    inv_scale = 1.0 / np.sqrt(h * h + w * w)
    lvl = min(int(d * inv_scale * 4.0), 3)
    seg = int(d * inv_gap[lvl])
    if seg < 2:
        return None  # reference divides 0/0 here
    step = 1.0 / seg
    cnt = 0
    ssum = 0.0
    for i in range(1, seg):
        p = ps * step * i + pe * step * (seg - i)
        if heat[int(p[1] + 0.5), int(p[0] + 0.5)] > 0.2:
            cnt += 1
        ssum += spec_bilinear(heat, p[0], p[1])
    return cnt / (seg - 1), ssum / (seg - 1)


# ---------------------------------------------------------------------------

def make_junction_map(h=96, w=128, n=400):
    junc = np.zeros((h, w), np.float32)
    ys = RNG.randint(0, h, n)
    xs = RNG.randint(0, w, n)
    junc[ys, xs] = RNG.rand(n).astype(np.float32) * 0.9 + 0.01
    return junc


class TestNMS:
    def test_matches_spec(self):
        junc = make_junction_map()
        ref = spec_nms(junc)
        xy, score, valid = nms_keypoints(jnp.asarray(junc))
        n = int(np.sum(np.asarray(valid)))
        assert n == len(ref)
        got = np.asarray(xy)[:n]
        ref_xy = np.array([(x, y) for x, y, _ in ref])
        np.testing.assert_array_equal(got, ref_xy)
        np.testing.assert_allclose(
            np.asarray(score)[:n], [s for _, _, s in ref], rtol=1e-6
        )

    def test_cap_500(self):
        junc = np.zeros((480, 752), np.float32)
        ys, xs = np.mgrid[10:470:10, 10:740:10]
        junc[ys.ravel(), xs.ravel()] = RNG.rand(ys.size) * 0.5 + 0.1
        xy, score, valid = nms_keypoints(jnp.asarray(junc))
        assert int(np.asarray(valid).sum()) == 500

    def test_radius_enforced(self):
        junc = make_junction_map()
        xy, _, valid = nms_keypoints(jnp.asarray(junc))
        n = int(np.asarray(valid).sum())
        p = np.asarray(xy)[:n]
        d = np.max(np.abs(p[:, None] - p[None, :]), axis=-1)
        d += np.eye(n, dtype=int) * 1000
        assert d.min() > 4


class TestRefine:
    def test_matches_spec(self):
        h, w = 96, 128
        heat = np.clip(RNG.rand(h, w).astype(np.float32) ** 3, 0, 1)
        heat[:16, :16] = 0.5  # saturated tile
        heat[16:32, :16] = 0.0  # untouched tile (no vals above thresh)
        ref = spec_refine(heat)
        got = np.asarray(refine_heatmap(jnp.asarray(heat)))
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestBilinear:
    def test_matches_spec(self):
        M = RNG.rand(32, 40).astype(np.float32)
        for _ in range(50):
            x = RNG.uniform(0, 38.9)
            y = RNG.uniform(0, 30.9)
            ref = spec_bilinear(M, x, y)
            got = float(bilinear_sample(jnp.asarray(M), jnp.float32(x), jnp.float32(y)))
            assert abs(got - ref) < 1e-5


class TestValidate:
    def test_matches_spec(self):
        h, w = 96, 128
        heat = np.clip(RNG.rand(h, w).astype(np.float32), 0, 1)
        ps = np.stack([RNG.uniform(2, w - 3, 64), RNG.uniform(2, h - 3, 64)], 1)
        pe = np.stack([RNG.uniform(2, w - 3, 64), RNG.uniform(2, h - 3, 64)], 1)
        rate, score = validate_edges(
            jnp.asarray(heat), jnp.asarray(ps.astype(np.float32)),
            jnp.asarray(pe.astype(np.float32)), jnp.ones(64, bool),
        )
        rate = np.asarray(rate)
        score = np.asarray(score)
        for k in range(64):
            ref = spec_validate(heat, ps[k], pe[k])
            if ref is None:
                continue
            assert abs(rate[k] - ref[0]) < 1e-5, k
            assert abs(score[k] - ref[1]) < 1e-4, k


class TestProbeMask:
    def test_matches_direct(self):
        h, w = 96, 128
        heat = np.clip(RNG.rand(h, w).astype(np.float32), 0, 1)
        kp = np.stack(
            [RNG.uniform(2, w - 3, 40), RNG.uniform(2, h - 3, 40)], 1
        ).astype(np.float32)
        ok = np.ones(40, bool)
        ok[5] = False
        got = np.asarray(pair_probe_mask(jnp.asarray(heat), jnp.asarray(kp),
                                         jnp.asarray(ok)))
        for i in range(40):
            for j in range(i + 1, 40):
                exp = ok[i] and ok[j]
                if exp:
                    for a in (0.2, 0.8, 0.5):
                        p = kp[j] * a + kp[i] * (1 - a)
                        if heat[int(p[1] + 0.5), int(p[0] + 0.5)] < 0.2:
                            exp = False
                            break
                assert got[i, j] == exp, (i, j)


class TestPallasSampler:
    def test_pallas_kernel_matches_xla_path(self):
        """The opt-in Pallas nearest-sampler (ops/sampling.py, PPG_PALLAS=1)
        must be bit-identical to the XLA one-hot path (interpret mode on
        the CPU test backend)."""
        import jax.numpy as jnp

        from ppg_slam_tpu.ops import sampling as S

        rng = np.random.RandomState(7)
        mask = S.pack_binary_mask(jnp.asarray(rng.rand(480, 752) > 0.7))
        n = 2 * S.SBLK
        ys = jnp.asarray(rng.randint(0, 480, n).astype(np.int32))
        xs = jnp.asarray(rng.randint(0, 752, n).astype(np.int32))
        ref = np.asarray(S.nearest_binary_packed(mask, ys, xs))
        pal = np.asarray(S._nearest_binary_packed_pallas(
            mask, ys, xs, interpret=True))
        assert ref.dtype == pal.dtype == np.bool_
        np.testing.assert_array_equal(ref, pal)
