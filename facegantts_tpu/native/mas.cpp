// Monotonic Alignment Search — host-side C++ kernel.
//
// Same DP semantics as the on-device JAX version in ops/mas.py and the
// reference's Cython kernel (model/monotonic_align/core.pyx:9-45): a
// Viterbi-style forward pass over the (t_x, t_y) log-prior followed by
// backtracking that emits a 0/1 monotonic path.  Batch items are independent
// and processed in parallel (OpenMP when available, else serial).
//
// Exposed with a C ABI for ctypes binding — no pybind11 dependency.

#include <algorithm>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

void mas_single(float* v, int32_t* path, int t_x, int t_y, int stride_y,
                float neg) {
  if (t_x <= 0 || t_y <= 0) return;
  // forward DP (in place over the value matrix)
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      const float stay = (x == y) ? neg : v[x * stride_y + (y - 1)];
      float advance;
      if (x == 0) {
        advance = (y == 0) ? 0.0f : neg;
      } else {
        advance = v[(x - 1) * stride_y + (y - 1)];
      }
      v[x * stride_y + y] += std::max(stay, advance);
    }
  }
  // backtracking
  int x = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[x * stride_y + y] = 1;
    if (x != 0 &&
        (x == y || v[x * stride_y + (y - 1)] < v[(x - 1) * stride_y + (y - 1)])) {
      --x;
    }
  }
}

}  // namespace

extern "C" {

// values:  (b, t_x_max, t_y_max) float32, overwritten with DP table
// paths:   (b, t_x_max, t_y_max) int32, zero-initialized by caller
// t_xs/t_ys: per-item valid lengths
void mas_maximum_path(float* values, int32_t* paths, const int32_t* t_xs,
                      const int32_t* t_ys, int b, int t_x_max, int t_y_max,
                      float max_neg_val) {
  const long plane = static_cast<long>(t_x_max) * t_y_max;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < b; ++i) {
    mas_single(values + i * plane, paths + i * plane, t_xs[i], t_ys[i],
               t_y_max, max_neg_val);
  }
}

}  // extern "C"
