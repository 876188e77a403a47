// Native host runtime for fgnn_tpu.
//
// TPU-native analog of the reference's OpenMP host paths:
//   * cpu_extraction.cc  — parallel feature gather from the (mmap) feature
//     matrix into a pinned staging buffer (DoCPUFeatureExtract hot path)
//   * pre_sampler.cc     — per-node access frequency counting
//   * cpu_hashtable2.cc  — (host fallback) dedup via sort
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Parallel row gather: out[i] = table[ids[i]] (ids<0 -> zero row).
// Matches cpu_extraction.cc semantics with -1 padding.
void fgnn_gather_f32(const float* table, int64_t num_rows, int64_t dim,
                     const int32_t* ids, int64_t n, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int32_t id = ids[i];
    float* dst = out + i * dim;
    if (id < 0 || id >= num_rows) {
      std::memset(dst, 0, sizeof(float) * dim);
    } else {
      std::memcpy(dst, table + static_cast<int64_t>(id) * dim,
                  sizeof(float) * dim);
    }
  }
}

// Gather only the first n_real rows, zero the padded tail (cache miss
// extraction, ExtractMissData analog).
void fgnn_gather_f32_partial(const float* table, int64_t num_rows,
                             int64_t dim, const int32_t* ids, int64_t n,
                             int64_t n_real, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float* dst = out + i * dim;
    if (i >= n_real) {
      std::memset(dst, 0, sizeof(float) * dim);
      continue;
    }
    int32_t id = ids[i];
    if (id < 0 || id >= num_rows) {
      std::memset(dst, 0, sizeof(float) * dim);
    } else {
      std::memcpy(dst, table + static_cast<int64_t>(id) * dim,
                  sizeof(float) * dim);
    }
  }
}

// Per-node access frequency accumulation (pre_sampler.cc:78-89 analog).
// counts must have num_nodes entries; ids<0 are skipped.
void fgnn_count_freq(const int32_t* ids, int64_t n, int64_t num_nodes,
                     int64_t* counts) {
#if defined(_OPENMP)
  int nt = omp_get_max_threads();
#else
  int nt = 1;
#endif
  if (n < (1 << 16) || nt == 1) {
    for (int64_t i = 0; i < n; ++i) {
      int32_t id = ids[i];
      if (id >= 0 && id < num_nodes) counts[id]++;
    }
    return;
  }
#pragma omp parallel
  {
    std::vector<int64_t> local(num_nodes, 0);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      int32_t id = ids[i];
      if (id >= 0 && id < num_nodes) local[id]++;
    }
#pragma omp critical
    {
      for (int64_t v = 0; v < num_nodes; ++v) counts[v] += local[v];
    }
  }
}

// Argsort descending by count (ranking builder; gnu_parallel::sort analog,
// pre_sampler.cc:96-109). Stable: ties broken by node id ascending.
void fgnn_rank_desc(const int64_t* counts, int64_t num_nodes, int32_t* out) {
  std::vector<int32_t> idx(num_nodes);
  for (int64_t i = 0; i < num_nodes; ++i) idx[i] = static_cast<int32_t>(i);
  std::stable_sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
    return counts[a] > counts[b];
  });
  std::memcpy(out, idx.data(), sizeof(int32_t) * num_nodes);
}

}  // extern "C"
