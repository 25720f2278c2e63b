// C++ unit tests for the native host runtime (libquiver_host.so).
//
// The tier-1 analogue of the reference's gtest suite (tests/cpp/:
// test_quiver_cpu.cpp:9-75 subset-validity, test_quiver.cu:17-165 CSR
// round-trip) — gtest is not available in this toolchain, so this is a
// dependency-free assert harness: each CHECK prints and fails the
// process on violation; exit code 0 == all tests green.
//
// Build & run:  make -C tests/cpp test   (or via tests/test_cpp.py)
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <random>
#include <set>
#include <vector>

extern "C" {
void qt_coo_to_csr(const int64_t*, const int64_t*, int64_t, int64_t,
                   int64_t*, int32_t*, int64_t*);
void qt_sample_rows(const int64_t*, const int32_t*, const int64_t*, int64_t,
                    int32_t, uint64_t, int32_t*, int64_t*, uint8_t*);
void qt_gather_rows(const uint8_t*, const int64_t*, int64_t, int64_t,
                    uint8_t*);
void qt_shuffle_rows(const int64_t*, int64_t, uint64_t, int32_t*, int64_t*);
void qt_build_alias(const int64_t*, const float*, int64_t, float*, int32_t*);
int qt_version();
}

static int g_failures = 0;

#define CHECK(cond)                                                      \
    do {                                                                 \
        if (!(cond)) {                                                   \
            std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, \
                         #cond);                                         \
            ++g_failures;                                                \
        }                                                                \
    } while (0)

#define CHECK_NEAR(a, b, tol)                                             \
    do {                                                                  \
        double _a = (a), _b = (b);                                        \
        if (std::abs(_a - _b) > (tol)) {                                  \
            std::fprintf(stderr, "FAIL %s:%d: |%g - %g| > %g\n",          \
                         __FILE__, __LINE__, _a, _b, (double)(tol));      \
            ++g_failures;                                                 \
        }                                                                 \
    } while (0)

struct Graph {
    int64_t V, E;
    std::vector<int64_t> row, col;       // COO
    std::vector<int64_t> indptr, eid;    // CSR
    std::vector<int32_t> indices;
};

// Random multigraph, then CSR via the unit under test.
static Graph make_graph(int64_t V, int64_t E, uint64_t seed) {
    Graph g;
    g.V = V;
    g.E = E;
    std::mt19937_64 rng(seed);
    std::uniform_int_distribution<int64_t> d(0, V - 1);
    for (int64_t e = 0; e < E; ++e) {
        g.row.push_back(d(rng));
        g.col.push_back(d(rng));
    }
    g.indptr.assign(V + 1, 0);
    g.indices.assign(E, 0);
    g.eid.assign(E, 0);
    qt_coo_to_csr(g.row.data(), g.col.data(), E, V, g.indptr.data(),
                  g.indices.data(), g.eid.data());
    return g;
}

// CSR round-trip: every row's column multiset equals the COO's, eid maps
// each slot back to the originating COO edge (reference test_quiver.cu).
static void test_coo_to_csr() {
    Graph g = make_graph(64, 512, 1);
    CHECK(g.indptr[0] == 0);
    CHECK(g.indptr[g.V] == g.E);
    std::vector<std::multiset<int64_t>> want(g.V);
    for (int64_t e = 0; e < g.E; ++e) want[g.row[e]].insert(g.col[e]);
    for (int64_t v = 0; v < g.V; ++v) {
        std::multiset<int64_t> got(g.indices.begin() + g.indptr[v],
                                   g.indices.begin() + g.indptr[v + 1]);
        CHECK(got == want[v]);
        for (int64_t s = g.indptr[v]; s < g.indptr[v + 1]; ++s) {
            int64_t e = g.eid[s];
            CHECK(g.row[e] == v);
            CHECK(g.col[e] == g.indices[s]);
        }
    }
    // intra-row edge order is stable (counting sort preserves COO order)
    for (int64_t v = 0; v < g.V; ++v)
        for (int64_t s = g.indptr[v] + 1; s < g.indptr[v + 1]; ++s)
            CHECK(g.eid[s - 1] < g.eid[s]);
}

// Sampler: masks count min(deg, k); sampled ids are real neighbors; no
// slot is picked twice within a row (reference is_sample_valid,
// test_quiver_cpu.cpp:34).
static void test_sample_rows_validity() {
    Graph g = make_graph(128, 1024, 2);
    const int32_t k = 7;
    std::vector<int64_t> seeds;
    for (int64_t v = 0; v < g.V; ++v) seeds.push_back(v);
    int64_t n = seeds.size();
    std::vector<int32_t> nbr(n * k);
    std::vector<int64_t> slot(n * k);
    std::vector<uint8_t> mask(n * k);
    qt_sample_rows(g.indptr.data(), g.indices.data(), seeds.data(), n, k,
                   123, nbr.data(), slot.data(), mask.data());
    for (int64_t i = 0; i < n; ++i) {
        int64_t v = seeds[i];
        int64_t deg = g.indptr[v + 1] - g.indptr[v];
        int64_t take = std::min<int64_t>(deg, k);
        std::set<int64_t> used;
        for (int32_t j = 0; j < k; ++j) {
            bool m = mask[i * k + j];
            CHECK(m == (j < take));
            if (!m) continue;
            int64_t s = slot[i * k + j];
            CHECK(s >= g.indptr[v] && s < g.indptr[v + 1]);
            CHECK(g.indices[s] == nbr[i * k + j]);
            CHECK(!used.count(s));  // without replacement
            used.insert(s);
        }
    }
}

// Sampler: over many trials each slot of a high-degree row appears with
// ~uniform frequency k/deg (Floyd k-subset is exactly uniform).
static void test_sample_rows_uniform() {
    const int64_t deg = 24;
    const int32_t k = 6;
    std::vector<int64_t> indptr = {0, deg};
    std::vector<int32_t> indices(deg);
    for (int64_t i = 0; i < deg; ++i) indices[i] = (int32_t)i;
    const int trials = 40000;
    std::vector<int64_t> seeds(trials, 0);
    std::vector<int32_t> nbr(trials * k);
    std::vector<int64_t> slot(trials * k);
    std::vector<uint8_t> mask(trials * k);
    qt_sample_rows(indptr.data(), indices.data(), seeds.data(), trials, k,
                   7, nbr.data(), slot.data(), mask.data());
    std::vector<int64_t> hits(deg, 0);
    for (int64_t t = 0; t < trials; ++t)
        for (int32_t j = 0; j < k; ++j)
            if (mask[t * k + j]) ++hits[slot[t * k + j]];
    double expect = double(trials) * k / deg;
    for (int64_t i = 0; i < deg; ++i)
        CHECK_NEAR(hits[i] / expect, 1.0, 0.05);
}

static void test_gather_rows() {
    const int64_t N = 200, D = 33;  // odd row width, byte-level copy
    std::vector<float> table(N * D);
    for (int64_t i = 0; i < N * D; ++i) table[i] = float(i) * 0.5f;
    std::vector<int64_t> ids = {0, 5, 199, 5, 42, 0, 77};
    std::vector<float> out(ids.size() * D, -1.f);
    qt_gather_rows(reinterpret_cast<const uint8_t*>(table.data()),
                   ids.data(), (int64_t)ids.size(), D * sizeof(float),
                   reinterpret_cast<uint8_t*>(out.data()));
    for (size_t i = 0; i < ids.size(); ++i)
        CHECK(std::memcmp(&out[i * D], &table[ids[i] * D],
                          D * sizeof(float)) == 0);
}

// Shuffle: each row remains a permutation of itself; (indices, eid)
// move together.
static void test_shuffle_rows() {
    Graph g = make_graph(64, 512, 3);
    std::vector<int32_t> ind2 = g.indices;
    std::vector<int64_t> eid2 = g.eid;
    qt_shuffle_rows(g.indptr.data(), g.V, 99, ind2.data(), eid2.data());
    bool any_moved = false;
    for (int64_t v = 0; v < g.V; ++v) {
        int64_t s = g.indptr[v], e = g.indptr[v + 1];
        std::multiset<int32_t> a(g.indices.begin() + s, g.indices.begin() + e);
        std::multiset<int32_t> b(ind2.begin() + s, ind2.begin() + e);
        CHECK(a == b);
        for (int64_t i = s; i < e; ++i) {
            CHECK(g.col[eid2[i]] == ind2[i]);  // pair moved together
            if (ind2[i] != g.indices[i]) any_moved = true;
        }
    }
    CHECK(any_moved);
}

// Alias tables: Vose construction draws each edge with probability
// proportional to its weight.
static void test_build_alias() {
    std::vector<int64_t> indptr = {0, 4, 4, 7};  // row 1 empty
    std::vector<float> w = {1, 2, 3, 4, 10, 0, 10};
    std::vector<float> prob(7);
    std::vector<int32_t> alias(7);
    qt_build_alias(indptr.data(), w.data(), 3, prob.data(), alias.data());
    for (int64_t v : {0, 2}) {
        int64_t s = indptr[v], e = indptr[v + 1], n = e - s;
        double wsum = 0;
        for (int64_t i = s; i < e; ++i) wsum += w[i];
        // simulate alias draws: pick bucket u, accept or take alias
        std::mt19937_64 rng(5);
        std::uniform_int_distribution<int64_t> db(0, n - 1);
        std::uniform_real_distribution<double> du(0.0, 1.0);
        const int trials = 200000;
        std::vector<int64_t> hits(n, 0);
        for (int t = 0; t < trials; ++t) {
            int64_t b = db(rng);
            int64_t pick = du(rng) < prob[s + b] ? b : alias[s + b];
            ++hits[pick];
        }
        for (int64_t i = 0; i < n; ++i) {
            CHECK(alias[s + i] >= 0 && alias[s + i] < n);
            CHECK_NEAR(double(hits[i]) / trials, w[s + i] / wsum, 0.01);
        }
    }
}

int main() {
    CHECK(qt_version() == 1);
    test_coo_to_csr();
    test_sample_rows_validity();
    test_sample_rows_uniform();
    test_gather_rows();
    test_shuffle_rows();
    test_build_alias();
    if (g_failures) {
        std::fprintf(stderr, "%d check(s) FAILED\n", g_failures);
        return 1;
    }
    std::printf("all C++ host-runtime tests passed\n");
    return 0;
}
