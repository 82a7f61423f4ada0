// Native host-side runtime ops for lidargs_tpu.
//
// TPU-native replacement for the reference's helper CUDA extensions on the
// *host* side of the pipeline (the TPU has no general scatter/hash engine,
// and these run once per scene at init time, before any device work):
//
//   * knn3_mean_sq_dist  — simple-knn's distCUDA2 (SURVEY N10; used by
//     scene/gaussian_model.py:286,302 for voxel-size estimation and initial
//     scales). Uniform grid hash + expanding-ring search: O(N) average vs
//     the O(N^2) brute force, handles the 500k-point init clouds of the
//     reference workload (scene/dataset_readers.py:466) in milliseconds.
//   * voxel_unique       — voxelize_sample (gaussian_model.py:272-276):
//     exact np.unique(np.round(p/voxel), axis=0) semantics including
//     round-half-to-even and lexicographic row order.
//
// Build: see build.py (g++ -O3 -march=native -fopenmp -shared -fPIC).
// Python binding: ctypes (lidargs_tpu/native/__init__.py) with pure
// NumPy/JAX fallbacks when the shared object is unavailable.

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline uint64_t pack_cell(int64_t x, int64_t y, int64_t z) {
  // 21 bits per axis, offset-biased: collision-free for |coord| < 2^20
  const uint64_t bias = 1ull << 20;
  return ((uint64_t)(x + bias) << 42) | ((uint64_t)(y + bias) << 21) |
         (uint64_t)(z + bias);
}

struct CellMap {
  // cell id -> [start, end) into point-index array sorted by cell
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> ranges;
  std::vector<int32_t> order;
};

void build_cells(const float* pts, int32_t n, float inv_cell, CellMap& cm,
                 std::vector<int64_t>& cx, std::vector<int64_t>& cy,
                 std::vector<int64_t>& cz) {
  cx.resize(n);
  cy.resize(n);
  cz.resize(n);
  std::vector<uint64_t> key(n);
  for (int32_t i = 0; i < n; ++i) {
    cx[i] = (int64_t)std::floor(pts[3 * i + 0] * inv_cell);
    cy[i] = (int64_t)std::floor(pts[3 * i + 1] * inv_cell);
    cz[i] = (int64_t)std::floor(pts[3 * i + 2] * inv_cell);
    key[i] = pack_cell(cx[i], cy[i], cz[i]);
  }
  cm.order.resize(n);
  for (int32_t i = 0; i < n; ++i) cm.order[i] = i;
  std::sort(cm.order.begin(), cm.order.end(),
            [&](int32_t a, int32_t b) { return key[a] < key[b]; });
  cm.ranges.reserve(n / 2);
  int32_t s = 0;
  for (int32_t i = 1; i <= n; ++i) {
    if (i == n || key[cm.order[i]] != key[cm.order[s]]) {
      cm.ranges.emplace(key[cm.order[s]], std::make_pair(s, i));
      s = i;
    }
  }
}

}  // namespace

extern "C" {

// Mean squared distance to the 3 nearest neighbours within the same set.
// pts: [n, 3] float32 (row-major); out: [n] float32.
void knn3_mean_sq_dist(const float* pts, int32_t n, float* out) {
  if (n <= 1) {
    for (int32_t i = 0; i < n; ++i) out[i] = 0.0f;
    return;
  }
  // cell size ~ 2x the mean spacing from the bounding box
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (int32_t i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], pts[3 * i + d]);
      hi[d] = std::max(hi[d], pts[3 * i + d]);
    }
  double vol = 1.0;
  for (int d = 0; d < 3; ++d) vol *= std::max(1e-6, (double)hi[d] - lo[d]);
  float cell = (float)(2.0 * std::cbrt(vol / n));
  if (!(cell > 0.0f) || !std::isfinite(cell)) cell = 1.0f;
  const float inv_cell = 1.0f / cell;

  CellMap cm;
  std::vector<int64_t> cx, cy, cz;
  build_cells(pts, n, inv_cell, cm, cx, cy, cz);

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 256)
#endif
  for (int32_t i = 0; i < n; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    float best[3] = {INFINITY, INFINITY, INFINITY};
    int found = 0;
    const int kMaxRing = 1 << 10;
    for (int r = 0;; ++r) {
      // every unvisited cell is at Chebyshev ring >= r, so its points are
      // at least (r-1)*cell away: safe to stop once the 3rd-best is closer
      if (found >= 3 && r >= 2) {
        float bound = (float)(r - 1) * cell;
        if (best[2] <= bound * bound) break;
      }
      if (r > kMaxRing) break;
      bool any_cell = false;
      for (int64_t dx = -r; dx <= r; ++dx)
        for (int64_t dy = -r; dy <= r; ++dy)
          for (int64_t dz = -r; dz <= r; ++dz) {
            if (std::max({std::llabs(dx), std::llabs(dy), std::llabs(dz)}) != r)
              continue;
            auto it = cm.ranges.find(pack_cell(cx[i] + dx, cy[i] + dy, cz[i] + dz));
            if (it == cm.ranges.end()) continue;
            any_cell = true;
            for (int32_t s = it->second.first; s < it->second.second; ++s) {
              int32_t j = cm.order[s];
              if (j == i) continue;
              float ddx = pts[3 * j] - px;
              float ddy = pts[3 * j + 1] - py;
              float ddz = pts[3 * j + 2] - pz;
              float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
              if (d2 < best[2]) {
                best[2] = d2;
                if (best[2] < best[1]) std::swap(best[1], best[2]);
                if (best[1] < best[0]) std::swap(best[0], best[1]);
                if (found < 3) ++found;
              }
            }
          }
      (void)any_cell;
    }
    float acc = 0.0f;
    int cnt = 0;
    for (int k = 0; k < 3; ++k)
      if (std::isfinite(best[k])) {
        acc += best[k];
        ++cnt;
      }
    out[i] = cnt ? acc / 3.0f : 0.0f;  // distCUDA2 divides by 3 regardless
  }
}

// np.unique(np.round(pts / voxel), axis=0) * voxel.
// pts: [n, 3] float64; out: [max_out, 3] float64. Returns the number of
// unique voxels (clipped to max_out; call with max_out=0 to query size).
int32_t voxel_unique(const double* pts, int32_t n, double voxel, double* out,
                     int32_t max_out) {
  struct V3 {
    double x, y, z;
    bool operator<(const V3& o) const {
      if (x != o.x) return x < o.x;
      if (y != o.y) return y < o.y;
      return z < o.z;
    }
  };
  std::unordered_map<uint64_t, V3> seen;
  seen.reserve(n);
  const double inv = 1.0 / voxel;
  for (int32_t i = 0; i < n; ++i) {
    // np.round == round-half-to-even == nearbyint under FE_TONEAREST
    double rx = std::nearbyint(pts[3 * i + 0] * inv);
    double ry = std::nearbyint(pts[3 * i + 1] * inv);
    double rz = std::nearbyint(pts[3 * i + 2] * inv);
    uint64_t k = pack_cell((int64_t)rx, (int64_t)ry, (int64_t)rz);
    seen.emplace(k, V3{rx, ry, rz});
  }
  std::vector<V3> rows;
  rows.reserve(seen.size());
  for (auto& kv : seen) rows.push_back(kv.second);
  std::sort(rows.begin(), rows.end());
  int32_t m = (int32_t)rows.size();
  int32_t w = std::min(m, max_out);
  for (int32_t i = 0; i < w; ++i) {
    out[3 * i + 0] = rows[i].x * voxel;
    out[3 * i + 1] = rows[i].y * voxel;
    out[3 * i + 2] = rows[i].z * voxel;
  }
  return m;
}

// Range image -> point cloud with intensities (pano_to_lidar semantics,
// utils/lidar_utils.py:171-231): one point per pixel with depth > 0.
// pano: [H, W] depths; beams: [H] ascending; out_pts: [H*W, 4] (x,y,z,i).
// Returns count. Row r uses inclination beams[H-1-r]; column c uses
// azimuth  -(c - W/2) / W * 2*pi.
int32_t pano_to_points(const float* pano, const float* intensity, int32_t H,
                       int32_t W, const float* beams, float* out_pts) {
  int32_t cnt = 0;
  const double two_pi = 6.283185307179586;
  for (int32_t r = 0; r < H; ++r) {
    double alpha = beams[H - 1 - r];
    double ca = std::cos(alpha), sa = std::sin(alpha);
    for (int32_t c = 0; c < W; ++c) {
      float d = pano[r * W + c];
      if (!(d > 0.0f)) continue;
      double beta = -((double)c - W / 2.0) / W * two_pi;
      out_pts[4 * cnt + 0] = (float)(d * ca * std::cos(beta));
      out_pts[4 * cnt + 1] = (float)(d * ca * std::sin(beta));
      out_pts[4 * cnt + 2] = (float)(d * sa);
      out_pts[4 * cnt + 3] = intensity ? intensity[r * W + c] : 0.0f;
      ++cnt;
    }
  }
  return cnt;
}

}  // extern "C"
