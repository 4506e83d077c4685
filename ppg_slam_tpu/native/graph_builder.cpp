// Native PPG graph builder: the full host half of the front-end.
//
// C++ implementation of the host-side part of detectLines
// (frontend/graph_build.py, itself mirroring the reference
// feature/src/PPGExtractor.cpp:236-442): heat-map undistortion remap,
// all-pairs 3-probe gating, greedy order-dependent overlap suppression,
// sampled line validation, and colinear triplet extraction. Exposed via
// extern "C" + ctypes — the Python implementations remain the behavioral
// spec and fallback.
//
// Placement rationale (profiled on TPU v5e): these steps are random-access
// gather dominated — XLA lowers image gathers to ~40 ns/element scalar code
// on TPU (47 ms for the remap alone), while this C++ runs the whole block in
// ~2-4 ms. The MXU-friendly work (CNN forwards, NMS, descriptor sampling)
// stays on device; this mirrors the reference's own GPU/CPU split.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 graph_builder.cpp -o libppg_graph.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr float kPi = 3.14159265358979323846f;
constexpr float kDistThresh = 2.0f;       // LINE_DISTTHRESH
constexpr float kAngleThresh = 0.2f * kPi;

inline float wrap_abs_angle(float a) {
    if (a < -kPi) a += 2.0f * kPi;
    if (a > kPi) a -= 2.0f * kPi;
    return std::fabs(a);
}
}  // namespace

extern "C" {

// probe_mask: (k*k) uint8 symmetric gate; dist/ang: (k*k) float32.
// out_cands: capacity max_cands*2 int32; out_alive: max_cands uint8.
// Returns the number of candidates written (clipped at max_cands).
int ppg_suppress_candidates(const uint8_t* probe_mask, const float* dist,
                            const float* ang, int k, int32_t* out_cands,
                            uint8_t* out_alive, int max_cands) {
    std::vector<std::vector<int>> connected(k);
    std::vector<int> cand_a, cand_b;
    std::vector<uint8_t> bad;
    cand_a.reserve(max_cands);
    cand_b.reserve(max_cands);
    bad.reserve(max_cands);

    for (int i = 0; i < k; ++i) {
        const uint8_t* row = probe_mask + (size_t)i * k;
        for (int j = i + 1; j < k; ++j) {
            if (!row[j]) continue;
            bool overlap = false;
            const int pq[2][2] = {{i, j}, {j, i}};
            for (int side = 0; side < 2 && !overlap; ++side) {
                const int p = pq[side][0];
                const int q = pq[side][1];
                const float ang_pq = ang[(size_t)p * k + q];
                const float dist_pq = dist[(size_t)p * k + q];
                for (int lid : connected[p]) {
                    if (bad[lid]) continue;
                    const int pold =
                        (cand_a[lid] == p) ? cand_b[lid] : cand_a[lid];
                    const float adiff =
                        wrap_abs_angle(ang_pq - ang[(size_t)p * k + pold]);
                    if (adiff > kAngleThresh) continue;
                    const float dist_old = dist[(size_t)p * k + pold];
                    const float s = std::sin(adiff);
                    if (dist_pq <= dist_old && dist_pq * s < kDistThresh)
                        bad[lid] = 1;
                    if (dist_old < dist_pq && dist_old * s < kDistThresh)
                        overlap = true;
                }
            }
            if (overlap) continue;
            if ((int)cand_a.size() >= max_cands) continue;
            const int lid = (int)cand_a.size();
            cand_a.push_back(i);
            cand_b.push_back(j);
            bad.push_back(0);
            connected[i].push_back(lid);
            connected[j].push_back(lid);
        }
    }
    const int n = (int)cand_a.size();
    for (int c = 0; c < n; ++c) {
        out_cands[2 * c] = cand_a[c];
        out_cands[2 * c + 1] = cand_b[c];
        out_alive[c] = bad[c] ? 0 : 1;
    }
    return n;
}

// Colinear triplet extraction over the validated edge set.
// good: (n_cands) uint8; cands: (n_cands*2) int32; dist/ang as above.
// out_colines capacity max_col*3. Returns the triplet count.
int ppg_extract_colines(const int32_t* cands, const uint8_t* good,
                        int n_cands, const float* dist, const float* ang,
                        int k, int32_t* out_colines, int max_col) {
    std::vector<std::vector<int>> connected(k);
    for (int lid = 0; lid < n_cands; ++lid) {
        if (!good[lid]) continue;
        connected[cands[2 * lid]].push_back(lid);
        connected[cands[2 * lid + 1]].push_back(lid);
    }
    int n_out = 0;
    for (int p = 0; p < k; ++p) {
        std::vector<int> th = connected[p];
        while (th.size() > 1) {
            const int lid1 = th.back();
            const int a = cands[2 * lid1];
            const int b = cands[2 * lid1 + 1];
            const int p1 = (a == p) ? b : a;
            double best = 1e18;
            int best_idx = -1, best_p1 = -1, best_p2 = -1;
            for (size_t idx = 0; idx + 1 < th.size(); ++idx) {
                const int lid2 = th[idx];
                const int a2 = cands[2 * lid2];
                const int b2 = cands[2 * lid2 + 1];
                const int p2 = (a2 == p) ? b2 : a2;
                const float adiff =
                    ang[(size_t)p * k + p1] - ang[(size_t)p * k + p2];
                const double par = 0.5 *
                    (dist[(size_t)p * k + p1] + dist[(size_t)p * k + p2]) *
                    std::fabs(std::sin(adiff));
                if (par < best) {
                    best = par;
                    best_idx = (int)idx;
                    best_p1 = p1;
                    best_p2 = p2;
                }
            }
            if (best > kDistThresh) {
                th.pop_back();
                continue;
            }
            if (n_out < max_col) {
                out_colines[3 * n_out] = p;
                out_colines[3 * n_out + 1] = best_p1;
                out_colines[3 * n_out + 2] = best_p2;
                ++n_out;
            }
            th.pop_back();
            th[best_idx] = th.back();
            th.pop_back();
        }
    }
    return n_out;
}

}  // extern "C"

namespace {

constexpr float kHeatThresh = 0.2f;       // LINE_HEATMAP_THRESH
constexpr float kInlierRate = 0.8f;       // LINE_INLIER_RATE
constexpr float kInvGap[4] = {0.3333f, 0.200f, 0.1427f, 0.1111f};

// Bilinear sample with zero padding outside (cv::remap BORDER_CONSTANT 0 /
// ops.heatmap.bilinear_sample semantics), float32 arithmetic.
inline float bilinear(const float* img, int h, int w, float x, float y) {
    const float xf = std::floor(x);
    const float yf = std::floor(y);
    const float fx = x - xf;
    const float fy = y - yf;
    const int x0 = (int)xf;
    const int y0 = (int)yf;
    auto tap = [&](int yi, int xi) -> float {
        if (xi < 0 || xi >= w || yi < 0 || yi >= h) return 0.0f;
        return img[(size_t)yi * w + xi];
    };
    return tap(y0, x0) * (1.0f - fx) * (1.0f - fy) +
           tap(y0, x0 + 1) * fx * (1.0f - fy) +
           tap(y0 + 1, x0) * (1.0f - fx) * fy +
           tap(y0 + 1, x0 + 1) * fx * fy;
}

inline int round_clip(float v, int lim) {
    int i = (int)(v + 0.5f);
    if (i < 0) i = 0;
    if (i > lim) i = lim;
    return i;
}

}  // namespace

extern "C" {

// cv::remap(INTER_LINEAR, BORDER_CONSTANT 0) equivalent: out[y,x] =
// bilinear(src, mapx[y,x], mapy[y,x]). Mirrors ops.heatmap.remap_heatmap.
void ppg_remap(const float* src, const float* mapx, const float* mapy,
               int h, int w, float* out) {
    for (int y = 0; y < h; ++y) {
        const size_t row = (size_t)y * w;
        for (int x = 0; x < w; ++x)
            out[row + x] = bilinear(src, h, w, mapx[row + x], mapy[row + x]);
    }
}

// The full host graph build (detectLines, PPGExtractor.cpp:236-442):
//   heat  — (h*w) refined heat map, already in *undistorted* coordinates
//           (caller applies ppg_remap first when the camera has distortion);
//   kp_un — (k*2) undistorted keypoint positions; kp_ok — (k) validity.
// Outputs (caller-allocated):
//   out_edges (max_edges*2 int32), out_lscore (max_edges float),
//   out_colines (max_col*3 int32),
//   out_conn_cnt (k int32) + out_conn_flat (max_edges*2 int32): CSR adjacency
//     — per-keypoint final-edge-id lists, keypoint-major, insertion order.
//   n_col_out: written with the coline count.
// Returns the number of edges.
// Pair geometry (PPGExtractor.cpp:266-291): dist/dir matrices in float32
// with std::atan2(float) — bit-identical to the reference's Eigen math.
// (numpy's vectorized f32 arctan2 differs by ulps, which can cascade through
// the greedy suppression on threshold-degenerate inputs; tests therefore
// consume THIS geometry when the native lib is available.)
void ppg_pair_geometry(const float* kp_un, int k, float* dist, float* ang) {
    for (int i = 0; i < k; ++i) {
        for (int j = 0; j < k; ++j) {
            const float dx = kp_un[2 * j] - kp_un[2 * i];
            const float dy = kp_un[2 * j + 1] - kp_un[2 * i + 1];
            dist[(size_t)i * k + j] = std::sqrt(dx * dx + dy * dy);
            ang[(size_t)i * k + j] = std::atan2(dy, dx);
        }
    }
}

int ppg_build_graph(const float* heat, int h, int w, const float* kp_un,
                    const uint8_t* kp_ok, int k, int32_t* out_edges,
                    float* out_lscore, int32_t* out_colines,
                    int32_t* out_conn_cnt, int32_t* out_conn_flat,
                    int max_edges, int max_col, int32_t* n_col_out) {
    std::vector<float> dist((size_t)k * k), ang((size_t)k * k);
    ppg_pair_geometry(kp_un, k, dist.data(), ang.data());

    // probe gate + greedy overlap suppression, lexicographic (i, j) order
    std::vector<std::vector<int>> connected(k);
    std::vector<int> cand_a, cand_b;
    std::vector<uint8_t> bad;
    const float alphas[3] = {0.2f, 0.8f, 0.5f};
    for (int i = 0; i < k; ++i) {
        if (!kp_ok[i]) continue;
        const float xi = kp_un[2 * i], yi = kp_un[2 * i + 1];
        for (int j = i + 1; j < k; ++j) {
            if (!kp_ok[j]) continue;
            const float xj = kp_un[2 * j], yj = kp_un[2 * j + 1];
            bool gate = true;
            for (int a = 0; a < 3 && gate; ++a) {
                const float al = alphas[a];
                const float px = xj * al + xi * (1.0f - al);
                const float py = yj * al + yi * (1.0f - al);
                if (heat[(size_t)round_clip(py, h - 1) * w +
                         round_clip(px, w - 1)] < kHeatThresh)
                    gate = false;
            }
            if (!gate) continue;
            bool overlap = false;
            const int pq[2][2] = {{i, j}, {j, i}};
            for (int side = 0; side < 2 && !overlap; ++side) {
                const int p = pq[side][0];
                const int q = pq[side][1];
                const float ang_pq = ang[(size_t)p * k + q];
                const float dist_pq = dist[(size_t)p * k + q];
                for (int lid : connected[p]) {
                    if (bad[lid]) continue;
                    const int pold =
                        (cand_a[lid] == p) ? cand_b[lid] : cand_a[lid];
                    const float adiff =
                        wrap_abs_angle(ang_pq - ang[(size_t)p * k + pold]);
                    if (adiff > kAngleThresh) continue;
                    const float dist_old = dist[(size_t)p * k + pold];
                    const float s = std::sin(adiff);
                    if (dist_pq <= dist_old && dist_pq * s < kDistThresh)
                        bad[lid] = 1;
                    if (dist_old < dist_pq && dist_old * s < kDistThresh)
                        overlap = true;
                }
            }
            if (overlap) continue;
            const int lid = (int)cand_a.size();
            cand_a.push_back(i);
            cand_b.push_back(j);
            bad.push_back(0);
            connected[i].push_back(lid);
            connected[j].push_back(lid);
        }
    }

    // sampled line validation (heatMapInlierRate :461-498, heatMapLineScore
    // :500-513); only surviving candidates, like the reference
    const int n_cands = (int)cand_a.size();
    const float inv_scale = 1.0f / std::sqrt((float)(h * h + w * w));
    std::vector<float> lscore(n_cands, 0.0f);
    std::vector<uint8_t> good(n_cands, 0);
    for (int lid = 0; lid < n_cands; ++lid) {
        if (bad[lid]) continue;
        const int a0 = cand_a[lid], b0 = cand_b[lid];
        const float psx = kp_un[2 * a0], psy = kp_un[2 * a0 + 1];
        const float pex = kp_un[2 * b0], pey = kp_un[2 * b0 + 1];
        const float d = dist[(size_t)a0 * k + b0];
        int lvl = (int)(d * inv_scale * 4.0f);
        if (lvl > 3) lvl = 3;
        if (lvl < 0) lvl = 0;
        const int seg = (int)(d * kInvGap[lvl]);
        float rate, score;
        if (seg < 1) {
            continue;  // reference: rate = 0/-1 = -0 < 0.8 -> rejected
        } else if (seg == 1) {
            // reference: rate = 0/0 = NaN -> NaN comparisons false -> PASSES
            // with lscore = NaN; we pass with the defined midpoint heat
            // instead (a NaN edge weight would poison downstream BA).
            good[lid] = 1;
            lscore[lid] = bilinear(heat, h, w, 0.5f * (psx + pex),
                                   0.5f * (psy + pey));
            continue;
        } else {
            const float step = 1.0f / seg;
            int cnt = 0;
            float ssum = 0.0f;
            for (int s = 1; s < seg; ++s) {
                const float w1 = step * s;
                const float w2 = step * (seg - s);
                const float px = psx * w1 + pex * w2;
                const float py = psy * w1 + pey * w2;
                if (heat[(size_t)round_clip(py, h - 1) * w +
                         round_clip(px, w - 1)] > kHeatThresh)
                    ++cnt;
                ssum += bilinear(heat, h, w, px, py);
            }
            rate = (float)cnt / (float)(seg - 1);
            score = ssum / (float)(seg - 1);
        }
        if (rate >= kInlierRate && score >= kHeatThresh) {
            good[lid] = 1;
            lscore[lid] = rate * score;
        }
    }

    // colinear triplets over the validated edge set (:391-432)
    std::vector<int32_t> cands_flat(2 * (size_t)n_cands);
    for (int c = 0; c < n_cands; ++c) {
        cands_flat[2 * c] = cand_a[c];
        cands_flat[2 * c + 1] = cand_b[c];
    }
    *n_col_out = ppg_extract_colines(cands_flat.data(), good.data(), n_cands,
                                     dist.data(), ang.data(), k, out_colines,
                                     max_col);

    // final edge list in candidate order + CSR adjacency
    std::vector<std::vector<int>> conn_final(k);
    int n_edges = 0;
    for (int lid = 0; lid < n_cands; ++lid) {
        if (!good[lid]) continue;
        if (n_edges >= max_edges) break;
        out_edges[2 * n_edges] = cand_a[lid];
        out_edges[2 * n_edges + 1] = cand_b[lid];
        out_lscore[n_edges] = lscore[lid];
        conn_final[cand_a[lid]].push_back(n_edges);
        conn_final[cand_b[lid]].push_back(n_edges);
        ++n_edges;
    }
    int32_t off = 0;
    for (int p = 0; p < k; ++p) {
        out_conn_cnt[p] = (int32_t)conn_final[p].size();
        for (int eid : conn_final[p]) out_conn_flat[off++] = eid;
    }
    return n_edges;
}

// Host finalize for the fully-device front-end: greedy overlap suppression
// (PPGExtractor.cpp:314-359) over probe-gated candidates whose geometry
// (dist, atan2 both directions) and validation verdicts were computed ON
// DEVICE (ops.pairs) — this function never touches the heat map. Candidates
// arrive in lexicographic (i, j) order (the reference's construction order).
// good_val[lid] = device validation verdict; final good = survived && valid.
// Outputs as ppg_build_graph. Returns the edge count.
int ppg_finalize_graph(const int32_t* ci, const int32_t* cj,
                       const float* dist_c, const float* ang_ab,
                       const float* ang_ba, const uint8_t* good_val,
                       const float* lscore_val, int n_cands, int k,
                       int32_t* out_edges, float* out_lscore,
                       int32_t* out_colines, int32_t* out_conn_cnt,
                       int32_t* out_conn_flat, int max_edges, int max_col,
                       int32_t* n_col_out) {
    std::vector<std::vector<int>> connected(k);
    std::vector<uint8_t> bad(n_cands, 0);
    std::vector<uint8_t> inserted(n_cands, 0);
    // angle/dist seen FROM endpoint p of candidate lid
    auto ang_from = [&](int lid, int p) -> float {
        return (ci[lid] == p) ? ang_ab[lid] : ang_ba[lid];
    };
    for (int lid = 0; lid < n_cands; ++lid) {
        const int i = ci[lid], j = cj[lid];
        bool overlap = false;
        const int pq[2][2] = {{i, j}, {j, i}};
        for (int side = 0; side < 2 && !overlap; ++side) {
            const int p = pq[side][0];
            const float ang_pq = ang_from(lid, p);
            const float dist_pq = dist_c[lid];
            for (int old : connected[p]) {
                if (bad[old]) continue;
                const float adiff =
                    wrap_abs_angle(ang_pq - ang_from(old, p));
                if (adiff > kAngleThresh) continue;
                const float dist_old = dist_c[old];
                const float s = std::sin(adiff);
                if (dist_pq <= dist_old && dist_pq * s < kDistThresh)
                    bad[old] = 1;
                if (dist_old < dist_pq && dist_old * s < kDistThresh)
                    overlap = true;
            }
        }
        if (overlap) continue;
        inserted[lid] = 1;
        connected[i].push_back(lid);
        connected[j].push_back(lid);
    }

    std::vector<uint8_t> good(n_cands, 0);
    for (int lid = 0; lid < n_cands; ++lid)
        good[lid] = inserted[lid] && !bad[lid] && good_val[lid];

    // colines over the validated edge set, using device geometry
    {
        std::vector<std::vector<int>> conn2(k);
        for (int lid = 0; lid < n_cands; ++lid) {
            if (!good[lid]) continue;
            conn2[ci[lid]].push_back(lid);
            conn2[cj[lid]].push_back(lid);
        }
        int n_out = 0;
        for (int p = 0; p < k; ++p) {
            std::vector<int>& th = conn2[p];
            while (th.size() > 1) {
                const int lid1 = th.back();
                const float a1 = ang_from(lid1, p);
                const float d1 =
                    dist_c[lid1];
                double best = 1e18;
                int best_idx = -1;
                int p1 = (ci[lid1] == p) ? cj[lid1] : ci[lid1];
                int best_p1 = -1, best_p2 = -1;
                for (size_t idx = 0; idx + 1 < th.size(); ++idx) {
                    const int lid2 = th[idx];
                    const float adiff = a1 - ang_from(lid2, p);
                    const double par = 0.5 * (d1 + dist_c[lid2]) *
                        std::fabs(std::sin(adiff));
                    if (par < best) {
                        best = par;
                        best_idx = (int)idx;
                        best_p1 = p1;
                        best_p2 = (ci[lid2] == p) ? cj[lid2] : ci[lid2];
                    }
                }
                if (best > kDistThresh) {
                    th.pop_back();
                    continue;
                }
                if (n_out < max_col) {
                    out_colines[3 * n_out] = p;
                    out_colines[3 * n_out + 1] = best_p1;
                    out_colines[3 * n_out + 2] = best_p2;
                    ++n_out;
                }
                th.pop_back();
                th[best_idx] = th.back();
                th.pop_back();
            }
        }
        *n_col_out = n_out;
    }

    // final edge list in candidate order + CSR adjacency
    std::vector<std::vector<int>> conn_final(k);
    int n_edges = 0;
    for (int lid = 0; lid < n_cands; ++lid) {
        if (!good[lid]) continue;
        if (n_edges >= max_edges) break;
        out_edges[2 * n_edges] = ci[lid];
        out_edges[2 * n_edges + 1] = cj[lid];
        out_lscore[n_edges] = lscore_val[lid];
        conn_final[ci[lid]].push_back(n_edges);
        conn_final[cj[lid]].push_back(n_edges);
        ++n_edges;
    }
    int32_t off = 0;
    for (int p = 0; p < k; ++p) {
        out_conn_cnt[p] = (int32_t)conn_final[p].size();
        for (int eid : conn_final[p]) out_conn_flat[off++] = eid;
    }
    return n_edges;
}

}  // extern "C"
