// Native host-side particle bucketing — the threadpooled counting sort of
// the reference's rebuild (space_rebuild.c:49 + space_cell_index.c), as a
// small OpenMP C++ library.  Used for large-N initial-condition ingestion
// where a single-threaded numpy argsort dominates start-up time; the
// in-step (device) rebucketing stays in XLA.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC bucketsort.cpp
// Bound via ctypes (see native/__init__.py).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Compute per-particle cell indices and cell-local offsets.
//   pos:   (n, 3) f64 absolute positions
//   box:   (3,) f64;  cdim: (3,) i32
//   cell:  (n,) i32 out — linearized cell index ((ix*ncy)+iy)*ncz+iz
//   off:   (n, 3) f32 out — position minus cell corner
void sst_cell_index(const double* pos, int64_t n, const double* box,
                    const int32_t* cdim, int32_t* cell, float* off) {
  const double ex = box[0] / cdim[0];
  const double ey = box[1] / cdim[1];
  const double ez = box[2] / cdim[2];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    double x = std::fmod(pos[3 * i + 0], box[0]);
    double y = std::fmod(pos[3 * i + 1], box[1]);
    double z = std::fmod(pos[3 * i + 2], box[2]);
    if (x < 0) x += box[0];
    if (y < 0) y += box[1];
    if (z < 0) z += box[2];
    int32_t ix = (int32_t)(x / ex);
    int32_t iy = (int32_t)(y / ey);
    int32_t iz = (int32_t)(z / ez);
    if (ix >= cdim[0]) ix = cdim[0] - 1;
    if (iy >= cdim[1]) iy = cdim[1] - 1;
    if (iz >= cdim[2]) iz = cdim[2] - 1;
    cell[i] = (ix * cdim[1] + iy) * cdim[2] + iz;
    off[3 * i + 0] = (float)(x - ix * ex);
    off[3 * i + 1] = (float)(y - iy * ey);
    off[3 * i + 2] = (float)(z - iz * ez);
  }
}

// Counting sort: for each particle, its destination slot (cell*K + rank)
// or -1 if the cell overflowed capacity K.  Returns the overflow count.
//   cell:  (n,) i32;  counts scratch is internal.
int64_t sst_slot_assign(const int32_t* cell, int64_t n, int32_t n_cells,
                        int32_t K, int64_t* slot) {
  std::vector<std::atomic<int32_t>> counts(n_cells);
  for (int32_t c = 0; c < n_cells; c++)
    counts[c].store(0, std::memory_order_relaxed);

  std::atomic<int64_t> overflow{0};
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    const int32_t c = cell[i];
    const int32_t rank = counts[c].fetch_add(1, std::memory_order_relaxed);
    if (rank < K) {
      slot[i] = (int64_t)c * K + rank;
    } else {
      slot[i] = -1;
      overflow.fetch_add(1, std::memory_order_relaxed);
    }
  }
  return overflow.load();
}

// Max particles in any cell (for capacity sizing).
int32_t sst_max_cell_count(const int32_t* cell, int64_t n,
                           int32_t n_cells) {
  std::vector<std::atomic<int32_t>> counts(n_cells);
  for (int32_t c = 0; c < n_cells; c++)
    counts[c].store(0, std::memory_order_relaxed);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++)
    counts[cell[i]].fetch_add(1, std::memory_order_relaxed);
  int32_t mx = 0;
  for (int32_t c = 0; c < n_cells; c++) {
    const int32_t v = counts[c].load(std::memory_order_relaxed);
    if (v > mx) mx = v;
  }
  return mx;
}

// Gather f32 rows into slots: out[slot[i]*width .. ] = src[i*width .. ].
void sst_scatter_f32(const float* src, const int64_t* slot, int64_t n,
                     int32_t width, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    const int64_t s = slot[i];
    if (s >= 0) std::memcpy(out + s * width, src + i * width,
                            sizeof(float) * width);
  }
}

void sst_scatter_i32(const int32_t* src, const int64_t* slot, int64_t n,
                     int32_t width, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    const int64_t s = slot[i];
    if (s >= 0) std::memcpy(out + s * width, src + i * width,
                            sizeof(int32_t) * width);
  }
}

int sst_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
