// Native host-side point-cloud kernels (C++17, ctypes ABI).
//
// TPU-native counterpart of the reference's cpp_wrappers (grid subsampling,
// cpp_subsampling/grid_subsampling.cpp:5-211; radius neighbors,
// cpp_neighbors/neighbors.cpp:211-332) — written from scratch around a flat
// spatial hash instead of nanoflann KD-trees.  On the TPU path these ops run
// on device (pcrcg_tpu/ops); this library serves the host side: dataset
// preprocessing (KITTI voxel downsample, correspondence counting, budget
// calibration) and golden cross-checks of the device kernels.
//
// Exported ABI (all float32 / int32, row-major):
//   grid_subsample(points[n,3], n, dl, out_points[cap,3], cap) -> n_out
//   radius_neighbors(queries[nq,3], nq, supports[ns,3], ns, radius, k,
//                    out_idx[nq,k]) -> 0; indices sorted by distance,
//                    padded with ns (the shadow index convention)
//   radius_count(queries, nq, supports, ns, radius, out_counts[nq]) -> 0
#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int64_t v;
  bool operator==(const Key& o) const { return v == o.v; }
};
struct KeyHash {
  size_t operator()(const Key& k) const {
    return std::hash<int64_t>()(k.v);
  }
};

inline int64_t cell_key(int ix, int iy, int iz) {
  // 21 bits per axis, offset to keep non-negative.
  const int64_t off = 1 << 20;
  return ((int64_t)(ix + off) << 42) | ((int64_t)(iy + off) << 21) |
         (int64_t)(iz + off);
}

// Spatial hash over support points for radius queries.
struct HashGrid {
  float cell;
  std::unordered_map<Key, std::vector<int>, KeyHash> cells;
  const float* pts;
  int n;

  void build(const float* supports, int ns, float cell_size) {
    pts = supports;
    n = ns;
    cell = cell_size;
    cells.reserve(ns);
    for (int i = 0; i < ns; ++i) {
      int ix = (int)std::floor(supports[3 * i] / cell);
      int iy = (int)std::floor(supports[3 * i + 1] / cell);
      int iz = (int)std::floor(supports[3 * i + 2] / cell);
      cells[Key{cell_key(ix, iy, iz)}].push_back(i);
    }
  }

  template <typename F>
  void for_each_in_radius(const float* q, float radius, F&& fn) const {
    const float r2 = radius * radius;
    int x0 = (int)std::floor((q[0] - radius) / cell);
    int x1 = (int)std::floor((q[0] + radius) / cell);
    int y0 = (int)std::floor((q[1] - radius) / cell);
    int y1 = (int)std::floor((q[1] + radius) / cell);
    int z0 = (int)std::floor((q[2] - radius) / cell);
    int z1 = (int)std::floor((q[2] + radius) / cell);
    for (int ix = x0; ix <= x1; ++ix)
      for (int iy = y0; iy <= y1; ++iy)
        for (int iz = z0; iz <= z1; ++iz) {
          auto it = cells.find(Key{cell_key(ix, iy, iz)});
          if (it == cells.end()) continue;
          for (int i : it->second) {
            float dx = pts[3 * i] - q[0];
            float dy = pts[3 * i + 1] - q[1];
            float dz = pts[3 * i + 2] - q[2];
            float d2 = dx * dx + dy * dy + dz * dz;
            if (d2 <= r2) fn(i, d2);
          }
        }
  }
};

}  // namespace

extern "C" {

// Barycenter voxel-grid downsample; returns number of cells written
// (≤ cap; surplus cells dropped in voxel-key order like the device kernel).
int grid_subsample(const float* points, int n, float dl, float* out, int cap) {
  if (n == 0) return 0;
  float mn[3] = {points[0], points[1], points[2]};
  for (int i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], points[3 * i + d]);
  float origin[3];
  for (int d = 0; d < 3; ++d) origin[d] = std::floor(mn[d] / dl) * dl;

  struct Acc { double s[3] = {0, 0, 0}; int c = 0; };
  std::unordered_map<Key, Acc, KeyHash> cells;
  cells.reserve(n);
  std::vector<int64_t> order;
  for (int i = 0; i < n; ++i) {
    int ix = (int)std::floor((points[3 * i] - origin[0]) / dl);
    int iy = (int)std::floor((points[3 * i + 1] - origin[1]) / dl);
    int iz = (int)std::floor((points[3 * i + 2] - origin[2]) / dl);
    Key k{cell_key(ix, iy, iz)};
    auto& acc = cells[k];
    if (acc.c == 0) order.push_back(k.v);
    for (int d = 0; d < 3; ++d) acc.s[d] += points[3 * i + d];
    acc.c += 1;
  }
  std::sort(order.begin(), order.end());
  int n_out = std::min((int)order.size(), cap);
  for (int j = 0; j < n_out; ++j) {
    const Acc& acc = cells[Key{order[j]}];
    for (int d = 0; d < 3; ++d) out[3 * j + d] = (float)(acc.s[d] / acc.c);
  }
  return n_out;
}

// Distance-sorted fixed-capacity radius neighbors, pad index = ns.
int radius_neighbors(const float* queries, int nq, const float* supports,
                     int ns, float radius, int k, int32_t* out_idx) {
  HashGrid grid;
  grid.build(supports, ns, radius);
  std::vector<std::pair<float, int>> found;
#pragma omp parallel for schedule(dynamic, 64) private(found)
  for (int q = 0; q < nq; ++q) {
    found.clear();
    grid.for_each_in_radius(queries + 3 * q, radius,
                            [&](int i, float d2) { found.emplace_back(d2, i); });
    int take = std::min((int)found.size(), k);
    std::partial_sort(found.begin(), found.begin() + take, found.end());
    for (int j = 0; j < take; ++j) out_idx[(int64_t)q * k + j] = found[j].second;
    for (int j = take; j < k; ++j) out_idx[(int64_t)q * k + j] = ns;
  }
  return 0;
}

// Per-query neighbor counts (budget calibration / correspondence counting).
int radius_count(const float* queries, int nq, const float* supports, int ns,
                 float radius, int32_t* out_counts) {
  HashGrid grid;
  grid.build(supports, ns, radius);
#pragma omp parallel for schedule(dynamic, 64)
  for (int q = 0; q < nq; ++q) {
    int c = 0;
    grid.for_each_in_radius(queries + 3 * q, radius,
                            [&](int, float) { ++c; });
    out_counts[q] = c;
  }
  return 0;
}

}  // extern "C"
