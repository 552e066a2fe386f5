// cuembed_tpu native host pipeline.
//
// The TPU-native counterpart of the reference's C++ host layer
// (utils/src/datagen.cpp, utils/src/embedding_allocation.cu,
// index_transforms host orchestration): everything that runs on the CPU
// feeding the chip. On TPU the hot compute lives in XLA/Pallas; the host
// side still wants native speed because the input pipeline (index
// generation or ingestion, id->row remapping for the tiered layout,
// CSR handling, frequency statistics) must outrun the device to stay
// off the critical path. All functions are exported with C linkage and
// bound from Python via ctypes (cuembed_tpu/native/__init__.py); a pure
// numpy fallback keeps the package dependency-free when the library is
// not built.
//
// Build: make -C native   (g++ -O3 -std=c++17 -shared -fPIC, std::thread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// Run fn(begin, end) over [0, n) on up to `threads` workers.
template <typename Fn>
void parallel_for(int64_t n, Fn fn, int threads = 0) {
  if (threads <= 0) threads = hardware_threads();
  threads = static_cast<int>(
      std::min<int64_t>(threads, std::max<int64_t>(n, 1)));
  if (threads <= 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min(n, b + chunk);
    if (b >= e) break;
    pool.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : pool) th.join();
}

// The reference's inverse-CDF transform (datagen.cpp:39-50):
//   y = (u * (max^g - min^g) + min^g)^(1/g),  g = 1 - alpha.
struct PowerLaw {
  double gamma, min_g, span, inv_gamma;
  PowerLaw(double min_v, double max_v, double alpha) {
    gamma = 1.0 - alpha;
    min_g = std::pow(min_v, gamma);
    span = std::pow(max_v, gamma) - min_g;
    inv_gamma = 1.0 / gamma;
  }
  inline int64_t draw(double u, int64_t num_categories) const {
    double y = std::floor(std::pow(u * span + min_g, inv_gamma));
    if (y < 1.0) return 1;
    if (y > static_cast<double>(num_categories)) return num_categories;
    return static_cast<int64_t>(y);
  }
};

}  // namespace

extern "C" {

// Power-law multi-hot index generation: the reference's
// PowerLawFeatureGenerator (datagen.cpp:87-104) — draw until `hotness`
// distinct ids per sample (first-h-distinct-draws semantics), optional
// permutation (applied via a caller-provided table) and per-sample
// shuffle. Deterministic per (seed, sample index) so generation order
// and thread count don't change the data.
//
// out:        [batch * hotness] int32
// permutation: optional [num_categories + 1] int32 (nullptr to skip)
void cuembed_powerlaw_indices(int64_t num_categories, int32_t hotness,
                              double alpha, int64_t batch, uint64_t seed,
                              const int32_t* permutation, int32_t shuffle,
                              int32_t* out) {
  const PowerLaw pl(1.0, static_cast<double>(num_categories) + 1.0, alpha);
  const bool uniform = alpha == 0.0;
  parallel_for(batch, [&](int64_t b0, int64_t b1) {
    std::vector<int64_t> sample;
    sample.reserve(hotness);
    for (int64_t b = b0; b < b1; ++b) {
      std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ull + b);
      std::uniform_real_distribution<double> uni(0.0, 1.0);
      sample.clear();
      while (static_cast<int32_t>(sample.size()) < hotness) {
        int64_t y;
        if (uniform) {
          y = 1 + static_cast<int64_t>(uni(rng) * num_categories);
          if (y > num_categories) y = num_categories;
        } else {
          y = pl.draw(uni(rng), num_categories);
        }
        if (std::find(sample.begin(), sample.end(), y) == sample.end())
          sample.push_back(y);
      }
      std::sort(sample.begin(), sample.end());
      int32_t* row = out + b * hotness;
      for (int32_t j = 0; j < hotness; ++j) {
        int64_t v = sample[j];
        row[j] = permutation ? permutation[v] : static_cast<int32_t>(v);
      }
      if (shuffle) {
        for (int32_t j = hotness - 1; j > 0; --j) {
          std::uniform_int_distribution<int32_t> pick(0, j);
          std::swap(row[j], row[pick(rng)]);
        }
      }
    }
  });
}

// id -> row translation for the tiered frequency-ordered layout
// (cuembed_tpu/utils/frequency.py). The pipeline-side hot path: remap a
// batch of indices through a [num_categories] table. ~memory-bound;
// multithreaded gather.
void cuembed_remap_indices(const int32_t* indices, int64_t n,
                           const int32_t* remap, int32_t* out) {
  parallel_for(n, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) out[i] = remap[indices[i]];
  });
}

// Frequency statistics accumulation (utils/frequency.py
// count_frequencies): counts[idx[i]] += 1. Single-threaded is plenty
// (stats run off the critical path on sampled batches).
void cuembed_count_frequencies(const int32_t* indices, int64_t n,
                               int64_t* counts, int64_t num_categories) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t v = indices[i];
    if (v >= 0 && v < num_categories) counts[v] += 1;
  }
}

// CSR row-id extraction (reference index_transforms.cuh:67-74): for each
// nonzero position p, the sample i with offsets[i] <= p < offsets[i+1].
void cuembed_extract_row_ids_from_csr(const int32_t* offsets, int64_t batch,
                                      int32_t* out) {
  parallel_for(batch, [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b)
      for (int32_t p = offsets[b]; p < offsets[b + 1]; ++p) out[p] = b;
  });
}

// COO transpose: stable counting-sort by lookup index (the host analog
// of the reference's cub::DeviceRadixSort Transpose,
// index_transforms.cuh:95-250). O(nnz + num_categories); stable order
// within an index run matches the CPU reference's tuple sort.
// work: caller-provided [num_categories + 1] int64 scratch.
void cuembed_transpose(const int32_t* indices, const int32_t* sample_ids,
                       const float* weights, int64_t nnz,
                       int64_t num_categories, int64_t* work,
                       int32_t* out_indices, int32_t* out_sample_ids,
                       float* out_weights) {
  std::memset(work, 0, sizeof(int64_t) * (num_categories + 1));
  for (int64_t i = 0; i < nnz; ++i) work[indices[i] + 1] += 1;
  for (int64_t c = 0; c < num_categories; ++c) work[c + 1] += work[c];
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t pos = work[indices[i]]++;
    out_indices[pos] = indices[i];
    out_sample_ids[pos] = sample_ids[i];
    if (weights) out_weights[pos] = weights[i];
  }
}

// Hot/cold partition statistics for capacity planning: number of
// indices >= hot_rows per chunk of `chunk_elems` flattened positions.
void cuembed_cold_counts(const int32_t* indices, int64_t n,
                         int32_t hot_rows, int64_t chunk_elems,
                         int32_t* out_counts, int64_t num_chunks) {
  parallel_for(num_chunks, [&](int64_t g0, int64_t g1) {
    for (int64_t g = g0; g < g1; ++g) {
      int32_t c = 0;
      const int64_t b = g * chunk_elems;
      const int64_t e = std::min(n, b + chunk_elems);
      for (int64_t i = b; i < e; ++i) c += indices[i] >= hot_rows;
      out_counts[g] = c;
    }
  });
}

// Host side of the offloaded-table lookup (cuembed_tpu/offload.py):
// dedupe this batch's cold ids (>= hot) and gather their tail rows into
// a fixed-capacity block. Returns the unique-cold count, or -(needed)
// when it exceeds cap (outputs untouched in that case). `tail` is the
// fp32 host master, rows indexed tail-relative.
int64_t cuembed_offload_prepare(const int32_t* idx, int64_t nnz,
                                int32_t hot, const float* tail,
                                int64_t width, int64_t cap,
                                int32_t* idx_hot, int32_t* slot,
                                uint8_t* is_cold, int32_t* uniq,
                                float* rows) {
  std::vector<int32_t> cold;
  cold.reserve(static_cast<size_t>(nnz));
  for (int64_t i = 0; i < nnz; ++i)
    if (idx[i] >= hot) cold.push_back(idx[i] - hot);
  std::sort(cold.begin(), cold.end());
  cold.erase(std::unique(cold.begin(), cold.end()), cold.end());
  const int64_t k = static_cast<int64_t>(cold.size());
  if (k > cap) return -k;
  std::copy(cold.begin(), cold.end(), uniq);
  parallel_for(nnz, [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      const bool c = idx[i] >= hot;
      is_cold[i] = c;
      idx_hot[i] = c ? 0 : idx[i];
      slot[i] = c ? static_cast<int32_t>(
                        std::lower_bound(cold.begin(), cold.end(),
                                         idx[i] - hot) -
                        cold.begin())
                  : 0;
    }
  });
  parallel_for(k, [&](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r)
      std::memcpy(rows + r * width,
                  tail + static_cast<int64_t>(cold[r]) * width,
                  sizeof(float) * width);
  });
  // zero the unused slots so the shipped block is deterministic
  if (k < cap)
    std::memset(rows + k * width, 0, sizeof(float) * (cap - k) * width);
  return k;
}

int32_t cuembed_native_abi_version() { return 2; }

}  // extern "C"
