// Native CPU engine: stable LSD radix sort + benchmark data generation.
//
// Role in the framework: the reference implements its host library and CPU
// oracle in C++ (reference: src/vk_radix_sort.h.in, bench/cpu_benchmark.cc,
// bench/data_generator.cc). The TPU compute path here is JAX/Pallas, but the
// CPU-side engine — oracle sorts for verification, a fast host fallback, and
// the mt19937 dataset generator — is native, exposed to Python via ctypes.
//
// Algorithm: 4-pass LSD radix over 8-bit digits with a single fused
// histogram pass (all 4 histograms computed in one read), ping-pong buffers
// — the same reduce-then-scan family as the reference device algorithm
// (reference: SURVEY.md "Algorithm in one paragraph"), expressed for a CPU.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 vrs_native.cpp
//        -o libvrs_native.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kRadix = 256;
constexpr int kPasses = 4;

// Tile-parallel threshold: below this the thread fan-out costs more than
// the scatter; above it the pass parallelizes per tile (stable: tiles are
// processed in order within each digit's output range).
constexpr size_t kParallelMinN = 1 << 20;

int thread_count(size_t n) {
  // VRS_NATIVE_THREADS overrides (tests force the tile-parallel path on
  // single-core boxes; threads timeslice, correctness is core-agnostic)
  unsigned hw = std::thread::hardware_concurrency();
  if (const char* env = std::getenv("VRS_NATIVE_THREADS")) {
    long v = std::strtol(env, nullptr, 10);
    if (v >= 1) hw = static_cast<unsigned>(v > 16 ? 16 : v);
  }
  if (hw <= 1 || n < kParallelMinN) return 1;
  size_t cap = n / (kParallelMinN / 4);
  unsigned t = hw < cap ? hw : static_cast<unsigned>(cap);
  return static_cast<int>(t > 16 ? 16 : t);
}

// One parallel radix pass: per-tile histogram of the CURRENT source (the
// permutation changes tile contents every pass), exclusive digit bases
// over (digit, tile) in tile order — which is what keeps the scatter
// stable — then per-tile scatter with private cursors.
template <typename Body>
void parallel_tiles(int T, size_t n, const Body& body) {
  if (T == 1) {
    body(0, 0, n);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(T);
  size_t tile = (n + T - 1) / T;
  for (int t = 0; t < T; ++t) {
    size_t lo = t * tile;
    size_t hi = lo + tile < n ? lo + tile : n;
    if (lo >= hi) break;
    ts.emplace_back(body, t, lo, hi);
  }
  for (auto& th : ts) th.join();
}

// Fused histogram: one read of the input produces all 4 per-pass
// histograms (the reference computes one histogram per pass in upsweep;
// fusing is the standard CPU optimization and halves passes over memory).
void histograms(const uint32_t* keys, size_t n, uint64_t (*hist)[kRadix]) {
  std::memset(hist, 0, sizeof(uint64_t) * kPasses * kRadix);
  for (size_t i = 0; i < n; ++i) {
    uint32_t k = keys[i];
    ++hist[0][k & 0xff];
    ++hist[1][(k >> 8) & 0xff];
    ++hist[2][(k >> 16) & 0xff];
    ++hist[3][(k >> 24) & 0xff];
  }
}

// Exclusive prefix sums in place; returns true if the pass is a no-op
// (all keys share one digit) so it can be skipped.
bool spine(uint64_t* h, size_t n) {
  uint64_t sum = 0;
  bool trivial = false;
  for (int r = 0; r < kRadix; ++r) {
    uint64_t c = h[r];
    if (c == n) trivial = true;
    h[r] = sum;
    sum += c;
  }
  return trivial;
}

// Tile-parallel stable LSD radix: per pass, per-tile digit histograms of
// the current permutation, exclusive bases laid out in (digit, tile)
// order — tiles scatter into disjoint, source-ordered ranges, which is
// exactly the stability argument — then per-tile scatter with private
// cursors. 2 reads/pass instead of the sequential path's fused 1+4, but
// each is T-way parallel.
template <bool KV>
void lsd_radix_mt(uint32_t* keys, uint32_t* values, size_t n, int T) {
  static thread_local std::vector<uint32_t> tmpk, tmpv;
  tmpk.resize(n);
  if (KV) tmpv.resize(n);
  uint32_t* ks = keys;
  uint32_t* kd = tmpk.data();
  uint32_t* vs = values;
  uint32_t* vd = KV ? tmpv.data() : nullptr;
  std::vector<std::vector<uint64_t>> hist(T,
                                          std::vector<uint64_t>(kRadix));
  std::vector<std::vector<uint64_t>> off(T, std::vector<uint64_t>(kRadix));
  for (int p = 0; p < kPasses; ++p) {
    const int shift = 8 * p;
    parallel_tiles(T, n, [&](int t, size_t lo, size_t hi) {
      auto& h = hist[t];
      std::fill(h.begin(), h.end(), 0);
      for (size_t i = lo; i < hi; ++i) ++h[(ks[i] >> shift) & 0xff];
    });
    bool trivial = false;
    uint64_t sum = 0;
    for (int r = 0; r < kRadix && !trivial; ++r) {
      uint64_t total = 0;
      for (int t = 0; t < T; ++t) total += hist[t][r];
      if (total == n) trivial = true;
    }
    if (trivial) continue;  // digit constant: skip the pass
    for (int r = 0; r < kRadix; ++r) {
      for (int t = 0; t < T; ++t) {
        off[t][r] = sum;
        sum += hist[t][r];
      }
    }
    parallel_tiles(T, n, [&](int t, size_t lo, size_t hi) {
      auto cur = off[t];  // private cursors
      for (size_t i = lo; i < hi; ++i) {
        uint64_t d = cur[(ks[i] >> shift) & 0xff]++;
        kd[d] = ks[i];
        if (KV) vd[d] = vs[i];
      }
    });
    std::swap(ks, kd);
    if (KV) std::swap(vs, vd);
  }
  if (ks != keys) {
    std::memcpy(keys, ks, n * sizeof(uint32_t));
    if (KV) std::memcpy(values, vs, n * sizeof(uint32_t));
  }
}

}  // namespace

extern "C" {

// Stable ascending sort of n uint32 keys, in place. Tile-parallel over
// std::thread::hardware_concurrency() when n is large enough to pay for
// the fan-out; sequential fused-histogram path otherwise.
void vrs_sort_u32(uint32_t* keys, size_t n) {
  if (n < 2) return;
  if (int T = thread_count(n); T > 1) {
    lsd_radix_mt<false>(keys, nullptr, n, T);
    return;
  }
  static thread_local std::vector<uint32_t> tmp;
  tmp.resize(n);
  uint64_t hist[kPasses][kRadix];
  histograms(keys, n, hist);
  uint32_t* src = keys;
  uint32_t* dst = tmp.data();
  for (int p = 0; p < kPasses; ++p) {
    if (spine(hist[p], n)) continue;  // digit constant: skip the pass
    const int shift = 8 * p;
    uint64_t* h = hist[p];
    for (size_t i = 0; i < n; ++i) {
      dst[h[(src[i] >> shift) & 0xff]++] = src[i];
    }
    std::swap(src, dst);
  }
  if (src != keys) std::memcpy(keys, src, n * sizeof(uint32_t));
}

// Stable ascending key-value sort, in place; values permuted alongside keys
// as a separate 32-bit buffer (reference README.md:60).
void vrs_sort_pairs_u32(uint32_t* keys, uint32_t* values, size_t n) {
  if (n < 2) return;
  if (int T = thread_count(n); T > 1) {
    lsd_radix_mt<true>(keys, values, n, T);
    return;
  }
  static thread_local std::vector<uint32_t> tmpk, tmpv;
  tmpk.resize(n);
  tmpv.resize(n);
  uint64_t hist[kPasses][kRadix];
  histograms(keys, n, hist);
  uint32_t* ks = keys;
  uint32_t* kd = tmpk.data();
  uint32_t* vs = values;
  uint32_t* vd = tmpv.data();
  for (int p = 0; p < kPasses; ++p) {
    if (spine(hist[p], n)) continue;
    const int shift = 8 * p;
    uint64_t* h = hist[p];
    for (size_t i = 0; i < n; ++i) {
      uint64_t d = h[(ks[i] >> shift) & 0xff]++;
      kd[d] = ks[i];
      vd[d] = vs[i];
    }
    std::swap(ks, kd);
    std::swap(vs, vd);
  }
  if (ks != keys) {
    std::memcpy(keys, ks, n * sizeof(uint32_t));
    std::memcpy(values, vs, n * sizeof(uint32_t));
  }
}

// mt19937 uniform uint32 generation (reference bench/data_generator.cc:3-27;
// seedable, optional reduced key range via `bits`).
void vrs_generate_uniform(uint32_t* out, size_t n, uint64_t seed, int bits) {
  std::mt19937 gen(static_cast<uint32_t>(seed));
  uint32_t mask =
      (bits >= 32 || bits <= 0) ? 0xffffffffu : ((1u << bits) - 1u);
  for (size_t i = 0; i < n; ++i) out[i] = gen() & mask;
}

// Sorted-run check used by tests/benchmarks: 1 if ascending.
int vrs_is_sorted_u32(const uint32_t* keys, size_t n) {
  for (size_t i = 1; i < n; ++i)
    if (keys[i - 1] > keys[i]) return 0;
  return 1;
}

}  // extern "C"
