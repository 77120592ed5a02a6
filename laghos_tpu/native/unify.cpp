// Native setup kernels for laghos_tpu.
//
// unify_rows: sorted deduplication of integer key rows with inverse map —
// the workhorse of mesh refinement (vertex identification) and H1 dof
// numbering (node identification across elements).  This is the role the
// reference delegates to MFEM's C++ mesh/FE-space machinery; here it is a
// single cache-friendly sort over fixed-width integer keys.
//
// Build: make -C laghos_tpu/native   (produces libsetup.so, loaded via
// ctypes with a NumPy fallback when absent).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// keys: nrows x ncols row-major int64. out_inverse: nrows int32.
// Returns the number of unique rows; unique row contents are written to
// out_unique (caller provides nrows x ncols; only the first
// `ndof` rows are valid), and out_first maps unique index -> an original
// row index holding that key (first in sorted order).
int64_t unify_rows(const int64_t* keys, int64_t nrows, int32_t ncols,
                   int32_t* out_inverse, int64_t* out_first) {
  std::vector<int64_t> order(nrows);
  std::iota(order.begin(), order.end(), int64_t{0});
  auto cmp = [keys, ncols](int64_t a, int64_t b) {
    const int64_t* ra = keys + a * ncols;
    const int64_t* rb = keys + b * ncols;
    for (int32_t c = 0; c < ncols; ++c) {
      if (ra[c] != rb[c]) return ra[c] < rb[c];
    }
    return a < b;
  };
  std::sort(order.begin(), order.end(), cmp);

  auto eq = [keys, ncols](int64_t a, int64_t b) {
    return std::memcmp(keys + a * ncols, keys + b * ncols,
                       sizeof(int64_t) * ncols) == 0;
  };
  int64_t ndof = -1;
  int64_t prev = -1;
  for (int64_t i = 0; i < nrows; ++i) {
    const int64_t row = order[i];
    if (prev < 0 || !eq(prev, row)) {
      ++ndof;
      out_first[ndof] = row;
    }
    out_inverse[row] = static_cast<int32_t>(ndof);
    prev = row;
  }
  return ndof + 1;
}

}  // extern "C"
