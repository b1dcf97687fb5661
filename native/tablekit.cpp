// Host-side table kit: multi-threaded fused neighbour-index translation.
//
// The predict loader turns a reference pass's neighbour table into the
// single device operand the normalization kernel needs:
//
//   out[r][j] = dist[r][j] < cutoff
//                 ? idx[r][j] + (idx[r][j] >= starts[r] ? sizes[r] : 0)
//                 : -1
//
// (index-space translation per MaskedLayout.neighbour_to_global +
// distance-cutoff fold per ops/normalize.sentinel_indexes).  numpy needs
// several [rows, 300] temporaries (int64 adds, boolean masks) and ~6-8 s
// of GIL-holding allocation churn at 15 kb scale; this does one pass,
// in-place, across threads.  Integer math and one float comparison only —
// bit-identical to the numpy path (asserted by tests/test_predict_pipeline).
//
// C ABI (ctypes): wcx_sentinel_translate.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// idx_itemsize: 4 (int32) or 8 (int64).  dist_itemsize: 4 (f32) or 8 (f64).
// starts/sizes: per-target-row chromosome start/size in masked space.
int wcx_sentinel_translate(const void* idx, int idx_itemsize,
                           const void* dist, int dist_itemsize,
                           int64_t rows, int64_t k,
                           const int64_t* starts, const int64_t* sizes,
                           double cutoff, int32_t* out) {
  if ((idx_itemsize != 4 && idx_itemsize != 8) ||
      (dist_itemsize != 4 && dist_itemsize != 8))
    return -1;

  auto worker = [&](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; r++) {
      const int64_t start = starts[r];
      const int64_t size = sizes[r];
      int32_t* orow = out + r * k;
      for (int64_t j = 0; j < k; j++) {
        const int64_t v =
            idx_itemsize == 4
                ? (int64_t)((const int32_t*)idx)[r * k + j]
                : ((const int64_t*)idx)[r * k + j];
        const double d =
            dist_itemsize == 4
                ? (double)((const float*)dist)[r * k + j]
                : ((const double*)dist)[r * k + j];
        orow[j] = d < cutoff
                      ? (int32_t)(v + (v >= start ? size : 0))
                      : -1;
      }
    }
  };

  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  if ((int64_t)n_threads > rows) n_threads = rows > 0 ? (unsigned)rows : 1;

  std::vector<std::thread> pool;
  const int64_t step = (rows + n_threads - 1) / n_threads;
  for (unsigned t = 0; t < n_threads; t++) {
    int64_t a = (int64_t)t * step;
    int64_t b = a + step < rows ? a + step : rows;
    if (a >= b) break;
    pool.emplace_back(worker, a, b);
  }
  for (auto& th : pool) th.join();
  return 0;
}

// Variant taking the bit-packed ``distance < cutoff`` mask (numpy
// packbits, big-endian bit order, rows padded to whole bytes) instead of
// the distance table — the cached-predict path never materializes
// distances at all.
int wcx_sentinel_translate_ok(const void* idx, int idx_itemsize,
                              const uint8_t* ok_bits, int64_t ok_stride,
                              int64_t rows, int64_t k,
                              const int64_t* starts, const int64_t* sizes,
                              int32_t* out) {
  if (idx_itemsize != 4 && idx_itemsize != 8) return -1;

  auto worker = [&](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; r++) {
      const int64_t start = starts[r];
      const int64_t size = sizes[r];
      const uint8_t* obits = ok_bits + r * ok_stride;
      int32_t* orow = out + r * k;
      for (int64_t j = 0; j < k; j++) {
        const bool ok = (obits[j >> 3] >> (7 - (j & 7))) & 1;
        const int64_t v =
            idx_itemsize == 4
                ? (int64_t)((const int32_t*)idx)[r * k + j]
                : ((const int64_t*)idx)[r * k + j];
        orow[j] = ok ? (int32_t)(v + (v >= start ? size : 0)) : -1;
      }
    }
  };

  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  if ((int64_t)n_threads > rows) n_threads = rows > 0 ? (unsigned)rows : 1;

  std::vector<std::thread> pool;
  const int64_t step = (rows + n_threads - 1) / n_threads;
  for (unsigned t = 0; t < n_threads; t++) {
    int64_t a = (int64_t)t * step;
    int64_t b = a + step < rows ? a + step : rows;
    if (a >= b) break;
    pool.emplace_back(worker, a, b);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
