// Monotonic alignment search (Viterbi DP + backtrack), batched.
//
// Native C++/OpenMP replacement for the reference's only compiled component
// (matcha/utils/monotonic_align/core.pyx): identical algorithm and layout —
// value[x, y] with x = text index (rows), y = mel index (cols):
//   value[x, y] += max(value[x, y-1] (diag-forbidden when x == y),
//                      value[x-1, y-1] (0 at origin))
// restricted to the monotonic band, then backtrack the argmax path.
//
// Build: g++ -O3 -fopenmp -shared -fPIC monotonic_align.cpp -o libmonotonic_align.so
// C ABI (ctypes):
//   void maximum_path_c(int* paths, float* values, const int* t_xs,
//                       const int* t_ys, int b, int max_t_x, int max_t_y);
// paths: (b, max_t_x, max_t_y) int32 out; values: float32 log-priors,
// MUTATED in place (as in the reference).

#include <algorithm>

extern "C" {

static void maximum_path_each(int* path, float* value, int t_x, int t_y,
                              int stride, float max_neg_val) {
  int index = t_x - 1;

  for (int y = 0; y < t_y; ++y) {
    int x_lo = std::max(0, t_x + y - t_y);
    int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      float v_cur = (x == y) ? max_neg_val : value[x * stride + (y - 1)];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : max_neg_val;
      } else {
        v_prev = value[(x - 1) * stride + (y - 1)];
      }
      value[x * stride + y] += std::max(v_cur, v_prev);
    }
  }

  for (int y = t_y - 1; y >= 0; --y) {
    path[index * stride + y] = 1;
    if (index != 0 && (index == y || value[index * stride + (y - 1)] <
                                         value[(index - 1) * stride + (y - 1)])) {
      index -= 1;
    }
  }
}

void maximum_path_c(int* paths, float* values, const int* t_xs,
                    const int* t_ys, int b, int max_t_x, int max_t_y) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    maximum_path_each(paths + (long)i * max_t_x * max_t_y,
                      values + (long)i * max_t_x * max_t_y, t_xs[i], t_ys[i],
                      max_t_y, -1e9f);
  }
}

}  // extern "C"
