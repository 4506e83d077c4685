"""End-to-end front-end test: full extractor vs a complete detectLines
transcription, on real net outputs over a synthetic structured image."""

import numpy as np
import pytest

from ppg_slam_tpu.geometry.cameras import CAM_PINHOLE, CameraModel
from ppg_slam_tpu.frontend import PPGExtractor
from ppg_slam_tpu.frontend.graph_build import pair_geometry_np


def spec_detect_lines(heat, kp_un, kp_ok):
    """Full transcription of PPGExtractor::detectLines (:236-442) on given
    refined+undistorted heat, undistorted keypoints and validity flags.

    Pair geometry must come from the same implementations the extractor
    uses: different libm variants (XLA, glibc atan2f, numpy SIMD) differ by
    ulps, which cascades through the order-dependent greedy suppression on
    threshold-degenerate images like this grid — the spec must consume the
    implementation's geometry to test the ALGORITHM. The implementation is
    split like the reference's GPU/CPU boundary: candidate VALIDATION
    (sample-count/level from dist) runs on device with device-computed dist
    (ops.pairs.candidate_geometry), while suppression + colines run on host
    with host-recomputed numpy f32 geometry (extractor._finish — the
    geometry is a pure function of kp_un, so it is not transferred).
    The spec mirrors that split: `dist`/`ang` (host numpy, suppression +
    colines) and `dist_dev` (device jnp, validation)."""
    import jax.numpy as jnp_

    from ppg_slam_tpu.frontend.graph_build import pair_geometry_np
    from ppg_slam_tpu.ops.lines import pair_geometry

    n = len(kp_un)
    dist, ang = pair_geometry_np(kp_un)
    dist_dev = np.asarray(pair_geometry(jnp_.asarray(kp_un))[0])
    f32 = np.float32

    def wrap_abs(a):
        if a < -np.pi:
            a += 2 * np.pi
        if a > np.pi:
            a -= 2 * np.pi
        return abs(a)

    h, w = heat.shape
    cands = []
    bad = []
    conn = [[] for _ in range(n)]
    for i in range(n):
        if not kp_ok[i]:
            continue
        for j in range(i + 1, n):
            if not kp_ok[j]:
                continue
            gate = True
            for a in (0.2, 0.8, 0.5):  # f32 arithmetic = device probe math
                p = kp_un[j] * f32(a) + kp_un[i] * f32(1 - a)
                if heat[int(p[1] + 0.5), int(p[0] + 0.5)] < 0.2:
                    gate = False
                    break
            if not gate:
                continue
            overlap = False
            for pid, qid in ((i, j), (j, i)):
                for lid in conn[pid]:
                    if bad[lid]:
                        continue
                    a0, b0 = cands[lid]
                    pold = b0 if a0 == pid else a0
                    adiff = wrap_abs(float(ang[pid, qid]) - float(ang[pid, pold]))
                    if adiff > 0.2 * np.pi:
                        continue
                    dn, do = float(dist[pid, qid]), float(dist[pid, pold])
                    s = np.sin(adiff)
                    if dn <= do and dn * s < 2.0:
                        bad[lid] = True
                    if do < dn and do * s < 2.0:
                        overlap = True
                if overlap:
                    break
            if overlap:
                continue
            lid = len(cands)
            cands.append((i, j))
            bad.append(False)
            conn[i].append(lid)
            conn[j].append(lid)

    # validation
    inv_gap = [0.3333, 0.200, 0.1427, 0.1111]
    inv_scale = 1.0 / np.sqrt(h * h + w * w)

    def bil(x, y):
        x1, y1 = int(x), int(y)
        d1 = (x1 + 1 - x) * heat[y1, x1] + (x - x1) * heat[y1, x1 + 1]
        d2 = (x1 + 1 - x) * heat[y1 + 1, x1] + (x - x1) * heat[y1 + 1, x1 + 1]
        return (y1 + 1 - y) * d1 + (y - y1) * d2

    lscore = [0.0] * len(cands)
    conn2 = [[] for _ in range(n)]
    for lid, (a0, b0) in enumerate(cands):
        if bad[lid]:
            continue
        ps, pe = kp_un[a0], kp_un[b0]
        d = dist_dev[a0, b0]  # device-computed f32 (validation runs on device)
        lvl = min(int(f32(f32(d * f32(inv_scale)) * f32(4.0))), 3)
        seg = int(f32(d * f32(inv_gap[lvl])))
        if seg < 1:
            bad[lid] = True  # reference: rate = 0/-1 = -0 < 0.8 -> rejected
            continue
        if seg == 1:
            # reference: rate = 0/0 = NaN -> NaN comparisons false -> passes
            # with NaN lscore; our code passes with defined (midpoint) score.
            lscore[lid] = float("nan")
            conn2[a0].append(lid)
            conn2[b0].append(lid)
            continue
        step = f32(1.0) / f32(seg)
        cnt, ssum = 0, 0.0
        for k in range(1, seg):  # f32 positions = device sampling math
            p = ps * f32(f32(k) * step) + pe * f32(f32(seg - k) * step)
            if heat[int(p[1] + 0.5), int(p[0] + 0.5)] > 0.2:
                cnt += 1
            ssum += bil(p[0], p[1])
        rate = cnt / (seg - 1)
        sc = ssum / (seg - 1)
        if rate < 0.8 or sc < 0.2:
            bad[lid] = True
            continue
        lscore[lid] = rate * sc
        conn2[a0].append(lid)
        conn2[b0].append(lid)

    # colines
    colines = []
    for p in range(n):
        this = list(conn2[p])
        while len(this) > 1:
            lid1 = this[-1]
            a0, b0 = cands[lid1]
            p1 = b0 if a0 == p else a0
            best = (1e18, -1, -1, -1)
            for idx in range(len(this) - 1):
                a2, b2 = cands[this[idx]]
                p2 = b2 if a2 == p else a2
                par = 0.5 * (dist[p, p1] + dist[p, p2]) * abs(
                    np.sin(float(ang[p, p1]) - float(ang[p, p2]))
                )
                if par < best[0]:
                    best = (par, idx, p1, p2)
            if best[0] > 2.0:
                this.pop()
                continue
            colines.append((p, best[2], best[3]))
            this.pop()
            this[best[1]] = this[-1]
            this.pop()

    edges = [(a0, b0) for lid, (a0, b0) in enumerate(cands) if not bad[lid]]
    scores = [lscore[lid] for lid in range(len(cands)) if not bad[lid]]
    return edges, scores, colines


@pytest.fixture(scope="module")
def synthetic_image():
    """Checkerboard + lines + noise: produces real junctions and line heat."""
    rng = np.random.RandomState(5)
    h, w = 240, 320
    img = np.full((h, w), 128, np.uint8)
    for k in range(1, 6):
        img[k * 40, :] = 255
        img[:, k * 50] = 255
    for k in range(8):  # diagonal lines
        x0, y0 = rng.randint(0, w - 80), rng.randint(0, h - 80)
        for t in range(80):
            img[y0 + t // 2, x0 + t] = 0
    img = np.clip(
        img.astype(np.int32) + rng.randint(-15, 15, (h, w)), 0, 255
    ).astype(np.uint8)
    return img


def test_extractor_end_to_end_matches_spec(synthetic_image):
    cam = CameraModel(kind=CAM_PINHOLE, fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                      dist=(0.0, 0.0, 0.0, 0.0), width=320, height=240)
    ex = PPGExtractor(cam)
    feats = ex.extract(synthetic_image)
    assert feats.n_kp > 50, "synthetic image should yield many keypoints"
    assert len(feats.edges) > 5, "grid image should yield edges"

    # recompute heat exactly as the device program does, then run the spec
    heat = ex.device_heat(synthetic_image)
    a = ex._device_outputs(synthetic_image)
    kp_un = np.asarray(a["kp_un"])[: feats.n_kp]
    kp_ok = ~feats.kp_out
    edges, scores, colines = spec_detect_lines(heat, kp_un, kp_ok)

    assert [tuple(e) for e in feats.edges] == edges
    # XLA fuses a*b+c into FMA when computing sample positions, so a sample
    # sitting exactly on a pixel boundary (common on this synthetic grid) can
    # land one cell over vs the python transcription, jumping that sample's
    # bilinear value by the local contrast. Edge/coline LISTS above are
    # compared exactly; scores must agree tightly except for a few sparse
    # cell flips, each bounded by contrast/segment-count.
    diffs = np.array([abs(g - r) for g, r in zip(feats.edge_score, scores)
                      if not np.isnan(r)])
    assert np.mean(diffs < 5e-4) > 0.9, diffs[diffs >= 5e-4]
    assert diffs.max() < 5e-2, diffs.max()
    assert [tuple(c) for c in feats.colines] == colines


def test_extractor_descriptors_normalized(synthetic_image):
    cam = CameraModel(kind=CAM_PINHOLE, fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                      dist=(0.0, 0.0, 0.0, 0.0), width=320, height=240)
    ex = PPGExtractor(cam)
    feats = ex.extract(synthetic_image)
    norms = np.linalg.norm(feats.desc, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


@pytest.mark.slow
def test_extractor_descriptor_matches_torch_grid_sampler(synthetic_image):
    # Slow lane: torch golden-parity check (grid_sampler semantics), the
    # same charter as the TorchScript net goldens in test_ppg_net.py.
    torch = pytest.importorskip("torch")
    cam = CameraModel(kind=CAM_PINHOLE, fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                      dist=(0.0, 0.0, 0.0, 0.0), width=320, height=240)
    ex = PPGExtractor(cam)
    import jax.numpy as jnp_
    a = ex._device_outputs(synthetic_image)
    n = int(a["n_kp"])
    kp = np.asarray(ex.extract(synthetic_image).kp_pos)[:n]
    descs = np.asarray(a["descs"])[:n]

    # torch oracle (PPGExtractor.cpp:526-537)
    desc_map = np.asarray(
        __import__("ppg_slam_tpu.models", fromlist=["descriptor_apply"])
        .descriptor_apply(
            ex.params,
            __import__("ppg_slam_tpu.models", fromlist=["backbone_apply"])
            .backbone_apply(
                ex.params,
                jnp_.asarray(synthetic_image)[None, :, :, None].astype(np.float32) / 255.0,
            ),
        )
    )[0]
    t_desc = torch.from_numpy(desc_map.transpose(2, 0, 1))[None]
    grid = torch.zeros((1, n, 1, 2))
    grid[0, :, 0, 0] = torch.from_numpy(kp[:, 0] / 320 * 2 - 1)
    grid[0, :, 0, 1] = torch.from_numpy(kp[:, 1] / 240 * 2 - 1)
    with torch.no_grad():
        sv = torch.squeeze(
            torch.grid_sampler(t_desc, grid, 0, 0, False)
        ).permute(1, 0)
        ref = torch.nn.functional.normalize(sv, dim=1).numpy()
    np.testing.assert_allclose(descs, ref, atol=2e-4)
