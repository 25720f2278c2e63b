// Native host runtime for quiver-tpu.
//
// TPU-native equivalent of the reference's C++ components that belong on
// the HOST in a TPU system (the device path is XLA/Pallas):
//   * COO -> CSR builder       (reference quiver<T,CUDA>::New,
//                               srcs/cpp/include/quiver/quiver.cu.hpp:218-238,
//                               and CPU sparse.hpp compress_row_idx:8-32)
//   * k-hop CPU sampler        (reference quiver<T,CPU>::sample_kernel,
//                               srcs/cpp/include/quiver/quiver.cpu.hpp:58-102)
//     emitting the dense positional contract used by the TPU pipeline
//   * row gather               (host cold-tier analogue of
//                               quiver_tensor_gather, shard_tensor.cu.hpp:19-61)
//   * per-row shuffle          (preprocessing for window sampling)
//
// Plain C ABI, loaded via ctypes; threaded with std::thread (no deps).
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? static_cast<int>(n) : 4;
}

template <typename F>
void parallel_for(int64_t n, F&& fn) {
    int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(n, 1));
    if (nt <= 1) { fn(int64_t(0), n, 0); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(lo + chunk, n);
        if (lo >= hi) break;
        ts.emplace_back([=, &fn] { fn(lo, hi, t); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// COO -> CSR with stable intra-row edge order and eid tracking.
// counting-sort: O(E + V), threaded histogram.
void qt_coo_to_csr(const int64_t* row, const int64_t* col, int64_t E,
                   int64_t V, int64_t* indptr, int32_t* indices,
                   int64_t* eid) {
    std::memset(indptr, 0, sizeof(int64_t) * (V + 1));
    // histogram
    for (int64_t e = 0; e < E; ++e) ++indptr[row[e] + 1];
    for (int64_t v = 0; v < V; ++v) indptr[v + 1] += indptr[v];
    std::vector<int64_t> cursor(indptr, indptr + V);
    for (int64_t e = 0; e < E; ++e) {
        int64_t slot = cursor[row[e]]++;
        indices[slot] = static_cast<int32_t>(col[e]);
        if (eid) eid[slot] = e;
    }
}

// Uniform k-subset sampling per seed row, dense positional layout:
// out_nbr/out_slot/out_mask are [n_seeds, k] row-major.
// Reservoir sampling per row (reference quiver.cpu.hpp:14-27 std::sample).
void qt_sample_rows(const int64_t* indptr, const int32_t* indices,
                    const int64_t* seeds, int64_t n_seeds, int32_t k,
                    uint64_t seed, int32_t* out_nbr, int64_t* out_slot,
                    uint8_t* out_mask) {
    parallel_for(n_seeds, [&](int64_t lo, int64_t hi, int tid) {
        std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + tid + 1);
        std::vector<int64_t> pick(k);
        for (int64_t i = lo; i < hi; ++i) {
            int64_t v = seeds[i];
            int64_t s = indptr[v], e = indptr[v + 1];
            int64_t deg = e - s;
            int32_t* nbr = out_nbr + i * k;
            int64_t* slot = out_slot + i * k;
            uint8_t* msk = out_mask + i * k;
            int64_t take = std::min<int64_t>(deg, k);
            if (take == deg) {
                for (int64_t j = 0; j < take; ++j) pick[j] = s + j;
            } else {
                // Floyd's algorithm: uniform k-subset of [s, e)
                int64_t filled = 0;
                for (int64_t j = deg - take; j < deg; ++j) {
                    std::uniform_int_distribution<int64_t> d(0, j);
                    int64_t t = s + d(rng);
                    bool dup = false;
                    for (int64_t q = 0; q < filled; ++q)
                        if (pick[q] == t) { dup = true; break; }
                    pick[filled++] = dup ? s + j : t;
                }
            }
            for (int64_t j = 0; j < k; ++j) {
                if (j < take) {
                    nbr[j] = indices[pick[j]];
                    slot[j] = pick[j];
                    msk[j] = 1;
                } else {
                    nbr[j] = 0; slot[j] = 0; msk[j] = 0;
                }
            }
        }
    });
}

// Threaded row gather: out[i] = table[ids[i]] (row_bytes each).
void qt_gather_rows(const uint8_t* table, const int64_t* ids, int64_t n,
                    int64_t row_bytes, uint8_t* out) {
    parallel_for(n, [&](int64_t lo, int64_t hi, int) {
        for (int64_t i = lo; i < hi; ++i)
            std::memcpy(out + i * row_bytes, table + ids[i] * row_bytes,
                        row_bytes);
    });
}

// In-place random shuffle of each CSR row's (indices, eid) pair —
// preprocessing for contiguous-window sampling.
void qt_shuffle_rows(const int64_t* indptr, int64_t V, uint64_t seed,
                     int32_t* indices, int64_t* eid) {
    parallel_for(V, [&](int64_t lo, int64_t hi, int tid) {
        std::mt19937_64 rng(seed * 0xD1B54A32D192ED03ULL + tid + 1);
        for (int64_t v = lo; v < hi; ++v) {
            int64_t s = indptr[v], e = indptr[v + 1];
            for (int64_t j = e - 1; j > s; --j) {
                std::uniform_int_distribution<int64_t> d(s, j);
                int64_t t = d(rng);
                std::swap(indices[j], indices[t]);
                if (eid) std::swap(eid[j], eid[t]);
            }
        }
    });
}

// Block layout for TPU block-exact sampling: out is [V, lanes] int32 with
// out[v] = [start_v, deg_v, indices[start_v : start_v + min(deg_v, lanes-2)],
// 0-pad]. One descriptor-bound row gather then serves header + body on
// device (see sampling/kernels.py build_block_layout).
void qt_build_blocks(const int64_t* indptr, const int32_t* indices,
                     int64_t V, int32_t lanes, int32_t* out) {
    parallel_for(V, [&](int64_t lo, int64_t hi, int) {
        for (int64_t v = lo; v < hi; ++v) {
            int64_t s = indptr[v], e = indptr[v + 1];
            int32_t* row = out + v * lanes;
            row[0] = static_cast<int32_t>(s);
            row[1] = static_cast<int32_t>(e - s);
            int64_t body = std::min<int64_t>(e - s, lanes - 2);
            std::memcpy(row + 2, indices + s, body * sizeof(int32_t));
            std::memset(row + 2 + body, 0,
                        (lanes - 2 - body) * sizeof(int32_t));
        }
    });
}

// Per-row Vose alias tables over CSR edge weights -> O(1) weighted
// draws on device (replaces the reference's per-draw inverse-CDF binary
// search, cuda_random.cu.hpp:179-221). prob/alias are CSR-slot aligned.
void qt_build_alias(const int64_t* indptr, const float* weights, int64_t V,
                    float* prob, int32_t* alias) {
    parallel_for(V, [&](int64_t lo, int64_t hi, int) {
        std::vector<int64_t> small, large;
        std::vector<double> p;
        for (int64_t v = lo; v < hi; ++v) {
            int64_t s = indptr[v], e = indptr[v + 1];
            int64_t n = e - s;
            if (n == 0) continue;
            double sum = 0;
            p.assign(n, 0.0);
            for (int64_t i = 0; i < n; ++i) sum += weights[s + i];
            if (sum <= 0) {
                for (int64_t i = 0; i < n; ++i) {
                    prob[s + i] = 1.0f;
                    alias[s + i] = static_cast<int32_t>(i);
                }
                continue;
            }
            for (int64_t i = 0; i < n; ++i)
                p[i] = weights[s + i] / sum * n;
            small.clear(); large.clear();
            for (int64_t i = 0; i < n; ++i)
                (p[i] < 1.0 ? small : large).push_back(i);
            while (!small.empty() && !large.empty()) {
                int64_t sm = small.back(); small.pop_back();
                int64_t lg = large.back(); large.pop_back();
                prob[s + sm] = static_cast<float>(p[sm]);
                alias[s + sm] = static_cast<int32_t>(lg);
                p[lg] = (p[lg] + p[sm]) - 1.0;
                (p[lg] < 1.0 ? small : large).push_back(lg);
            }
            for (auto rest : {&small, &large})
                for (int64_t i : *rest) {
                    prob[s + i] = 1.0f;
                    alias[s + i] = static_cast<int32_t>(i);
                }
        }
    });
}

int qt_version() { return 1; }

}  // extern "C"
