// Native PPG graph builder: greedy edge suppression + colinear extraction.
//
// C++ port of the host-side sequential part of the front-end
// (frontend/graph_build.py, itself mirroring the reference
// feature/src/PPGExtractor.cpp:293-442). Exposed via extern "C" + ctypes —
// the Python implementation remains as the behavioral spec and fallback;
// this exists because the per-frame candidate loop is the only host-side
// hot path between the two device programs.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 graph_builder.cpp -o libppg_graph.so

#include <cmath>
#include <cstdint>
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
