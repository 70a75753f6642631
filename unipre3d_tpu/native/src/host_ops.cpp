// Host-side point-cloud kernels for the input pipeline.
//
// C++ equivalents of the reference's vendored native ops that run on the
// host side of the TPU pipeline (reference openpoints/cpp/
// pointnet2_batch/src/sampling_gpu.cu — FPS; openpoints/cpp/subsampling/
// grid_subsampling — voxel dedup; knn via nanoflann): data loading and
// augmentation happen on CPU before batches are shipped to the chips, so
// these are plain parallel (OpenMP) C++ instead of CUDA.
//
// Exposed with C linkage and consumed through ctypes
// (unipre3d_tpu/native/__init__.py); every entry point has a numpy
// fallback so the framework runs without the compiled library.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Farthest point sampling. xyz: [n, 3] row-major, out: [m] indices.
// Seeds at index 0 like the reference CUDA kernel (sampling_gpu.cu).
void fps(const float* xyz, int n, int m, int32_t* out) {
  if (n <= 0 || m <= 0) return;
  std::vector<float> min_d2(n, std::numeric_limits<float>::max());
  int cur = 0;
  out[0] = 0;
  for (int i = 1; i < m; ++i) {
    const float cx = xyz[3 * cur], cy = xyz[3 * cur + 1],
                cz = xyz[3 * cur + 2];
    float best = -1.f;
    int best_idx = 0;
#if defined(_OPENMP)
#pragma omp parallel
    {
      float tbest = -1.f;
      int tbest_idx = 0;
#pragma omp for nowait
      for (int j = 0; j < n; ++j) {
        const float dx = xyz[3 * j] - cx, dy = xyz[3 * j + 1] - cy,
                    dz = xyz[3 * j + 2] - cz;
        const float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < min_d2[j]) min_d2[j] = d2;
        if (min_d2[j] > tbest) {
          tbest = min_d2[j];
          tbest_idx = j;
        }
      }
#pragma omp critical
      {
        if (tbest > best) {
          best = tbest;
          best_idx = tbest_idx;
        }
      }
    }
#else
    for (int j = 0; j < n; ++j) {
      const float dx = xyz[3 * j] - cx, dy = xyz[3 * j + 1] - cy,
                  dz = xyz[3 * j + 2] - cz;
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < min_d2[j]) min_d2[j] = d2;
      if (min_d2[j] > best) {
        best = min_d2[j];
        best_idx = j;
      }
    }
#endif
    cur = best_idx;
    out[i] = cur;
  }
}

// Voxel-grid dedup: keeps ONE input row per occupied voxel (first in
// input order), like GridSample train mode with a fixed pick. Returns
// the number of kept rows; kept row indices in out_idx (capacity n),
// voxel coords in out_grid ([n, 3], int32).
int grid_subsample(const float* xyz, int n, float grid_size,
                   const float* min_coord, int32_t* out_idx,
                   int32_t* out_grid) {
  std::unordered_map<uint64_t, int32_t> seen;
  seen.reserve(static_cast<size_t>(n) * 2);
  int kept = 0;
  for (int i = 0; i < n; ++i) {
    const int64_t gx =
        static_cast<int64_t>(std::floor((xyz[3 * i] - min_coord[0]) / grid_size));
    const int64_t gy = static_cast<int64_t>(
        std::floor((xyz[3 * i + 1] - min_coord[1]) / grid_size));
    const int64_t gz = static_cast<int64_t>(
        std::floor((xyz[3 * i + 2] - min_coord[2]) / grid_size));
    const uint64_t key = (static_cast<uint64_t>(gx & 0x1FFFFF) << 42) |
                         (static_cast<uint64_t>(gy & 0x1FFFFF) << 21) |
                         static_cast<uint64_t>(gz & 0x1FFFFF);
    auto it = seen.find(key);
    if (it == seen.end()) {
      seen.emplace(key, kept);
      out_idx[kept] = i;
      out_grid[3 * kept] = static_cast<int32_t>(gx);
      out_grid[3 * kept + 1] = static_cast<int32_t>(gy);
      out_grid[3 * kept + 2] = static_cast<int32_t>(gz);
      ++kept;
    }
  }
  return kept;
}

// Brute-force kNN: query [nq, 3], support [ns, 3] -> idx [nq, k],
// d2 [nq, k], ascending by distance.
void knn(const float* query, int nq, const float* support, int ns, int k,
         int32_t* out_idx, float* out_d2) {
  if (k > ns) k = ns;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int i = 0; i < nq; ++i) {
    const float qx = query[3 * i], qy = query[3 * i + 1],
                qz = query[3 * i + 2];
    // simple insertion top-k (k is small: 3..32)
    std::vector<float> best_d(k, std::numeric_limits<float>::max());
    std::vector<int32_t> best_i(k, 0);
    for (int j = 0; j < ns; ++j) {
      const float dx = support[3 * j] - qx, dy = support[3 * j + 1] - qy,
                  dz = support[3 * j + 2] - qz;
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best_d[k - 1]) {
        int p = k - 1;
        while (p > 0 && best_d[p - 1] > d2) {
          best_d[p] = best_d[p - 1];
          best_i[p] = best_i[p - 1];
          --p;
        }
        best_d[p] = d2;
        best_i[p] = j;
      }
    }
    std::memcpy(out_idx + static_cast<size_t>(i) * k, best_i.data(),
                sizeof(int32_t) * k);
    std::memcpy(out_d2 + static_cast<size_t>(i) * k, best_d.data(),
                sizeof(float) * k);
  }
}

}  // extern "C"
