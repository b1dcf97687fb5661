// Host-side table kit: multi-threaded fused neighbour-index translation.
//
// The predict loader turns a reference pass's neighbour table into the
// single device operand the normalization kernel needs:
//
//   out[r][j] = keep(r, j)
//                 ? idx[r][j] + (idx[r][j] >= starts[r] ? sizes[r] : 0)
//                 : -1
//
// (index-space translation per MaskedLayout.neighbour_to_global +
// distance-cutoff fold per ops/normalize.sentinel_indexes).  numpy needs
// several [rows, 300] temporaries (int64 adds, boolean masks) and ~6-8 s
// of GIL-holding allocation churn at 15 kb scale; this does one pass,
// in-place, across threads.  Integer math and one float64 comparison (or
// a cached bit test) only — bit-identical to the numpy path (asserted by
// the test suite).
//
// C ABI (ctypes): wcx_sentinel_translate / wcx_sentinel_translate_ok.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Shared driver: one translation worker parameterized by the per-element
// keep predicate, row-partitioned over up to 16 threads.
template <class Keep>
int translate_rows(const void* idx, int idx_itemsize, int64_t rows,
                   int64_t k, const int64_t* starts, const int64_t* sizes,
                   int32_t* out, Keep keep) {
  if (idx_itemsize != 4 && idx_itemsize != 8) return -1;

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
        orow[j] = keep(r, j)
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

}  // namespace

extern "C" {

// keep = distance < cutoff.  idx_itemsize: 4 (int32) or 8 (int64);
// dist_itemsize: 4 (f32, compared after widening to double — matching
// the numpy fallback's float64 comparison) or 8 (f64).
// starts/sizes: per-target-row chromosome start/size in masked space.
int wcx_sentinel_translate(const void* idx, int idx_itemsize,
                           const void* dist, int dist_itemsize,
                           int64_t rows, int64_t k,
                           const int64_t* starts, const int64_t* sizes,
                           double cutoff, int32_t* out) {
  if (dist_itemsize == 4) {
    const float* d = (const float*)dist;
    return translate_rows(
        idx, idx_itemsize, rows, k, starts, sizes, out,
        [=](int64_t r, int64_t j) { return (double)d[r * k + j] < cutoff; });
  }
  if (dist_itemsize == 8) {
    const double* d = (const double*)dist;
    return translate_rows(
        idx, idx_itemsize, rows, k, starts, sizes, out,
        [=](int64_t r, int64_t j) { return d[r * k + j] < cutoff; });
  }
  return -1;
}

// keep = cached bit-packed ``distance < cutoff`` mask (numpy packbits,
// big-endian bit order, rows padded to whole bytes of stride
// ``ok_stride``) — the cached-predict path never materializes distances.
int wcx_sentinel_translate_ok(const void* idx, int idx_itemsize,
                              const uint8_t* ok_bits, int64_t ok_stride,
                              int64_t rows, int64_t k,
                              const int64_t* starts, const int64_t* sizes,
                              int32_t* out) {
  return translate_rows(
      idx, idx_itemsize, rows, k, starts, sizes, out,
      [=](int64_t r, int64_t j) {
        return (ok_bits[r * ok_stride + (j >> 3)] >> (7 - (j & 7))) & 1;
      });
}

}  // extern "C"
