// Connected-components labeling for floating-material detection.
//
// Native equivalent of the reference's cv2.connectedComponents call
// (`/root/reference/src/residuals_mechanics_K.py:369-380`): counts
// 8-connected components of the solid phase (pixels > threshold) of a
// binarized density image. Host-side, eval-only — called per generated
// sample after the reverse-diffusion run.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -o libpidm_cc.so connected_components.cpp

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

}  // namespace

extern "C" {

// Count 8-connected components of {img > threshold} on an h x w float image.
int32_t pidm_count_components(const float* img, int32_t h, int32_t w,
                              float threshold) {
  const auto idx = [w](int32_t i, int32_t j) { return i * w + j; };
  UnionFind uf(static_cast<size_t>(h) * w);
  for (int32_t i = 0; i < h; ++i) {
    for (int32_t j = 0; j < w; ++j) {
      if (img[idx(i, j)] <= threshold) continue;
      // union with already-visited 8-neighbours (up-left, up, up-right, left)
      const int32_t di[4] = {-1, -1, -1, 0};
      const int32_t dj[4] = {-1, 0, 1, -1};
      for (int k = 0; k < 4; ++k) {
        int32_t ni = i + di[k], nj = j + dj[k];
        if (ni < 0 || nj < 0 || nj >= w) continue;
        if (img[idx(ni, nj)] > threshold) uf.unite(idx(i, j), idx(ni, nj));
      }
    }
  }
  int32_t count = 0;
  for (int32_t i = 0; i < h; ++i)
    for (int32_t j = 0; j < w; ++j)
      if (img[idx(i, j)] > threshold && uf.find(idx(i, j)) == idx(i, j)) ++count;
  return count;
}

// Batched floating-material flags: out[b] = 1 iff the number of solid
// components differs from 1 (cv2 semantics: retval != 2 with one
// background label, `residuals_mechanics_K.py:377-380`).
void pidm_floating_material(const float* imgs, int32_t batch, int32_t h,
                            int32_t w, float threshold, int32_t* out) {
  const int64_t stride = static_cast<int64_t>(h) * w;
  for (int32_t b = 0; b < batch; ++b) {
    int32_t n = pidm_count_components(imgs + b * stride, h, w, threshold);
    out[b] = (n != 1) ? 1 : 0;
  }
}

}  // extern "C"
