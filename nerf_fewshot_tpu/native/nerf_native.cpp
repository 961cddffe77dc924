// Native host-side data-path kernels for nerf_fewshot_tpu.
//
// The reference framework is pure Python; its host-side data path (ray
// generation per view, RGBA→white compositing, bilinear target resizing,
// per-batch ray gathering — reference: src/utils/ray_utils.py:4-37,
// src/training/train.py:181-185, 266-272) runs in eager torch/numpy. Here
// those host ops are C++ (multithreaded where it pays) so large-scene data
// preparation and the per-step batch assembly stay off the Python
// interpreter. Exposed as a plain C ABI consumed via ctypes
// (nerf_fewshot_tpu/native/__init__.py); every function has a numpy
// fallback, and parity is pinned by tests/test_native.py.
//
// Conventions match the JAX ops exactly:
//  * get_rays: OpenGL pinhole, dirs = [(i-W/2)/f, -(j-H/2)/f, -1] rotated by
//    c2w[:3,:3] (row-major 4x4 input).
//  * resize_bilinear: torch F.interpolate(align_corners=false) semantics —
//    src = clamp((dst+0.5)*scale-0.5, 0, inf), edge-clamped taps.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Run fn(start, end) over [0, n) split across up to `threads` workers.
void parallel_for(int64_t n, int threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  threads = std::max<int64_t>(1, std::min<int64_t>(threads, n));
  if (threads == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}

}  // namespace

extern "C" {

// Pinhole rays for an H×W image. c2w: row-major 4×4. Outputs (H*W, 3) each.
void nerf_get_rays(int32_t H, int32_t W, float focal, const float* c2w,
                   float* rays_o, float* rays_d) {
  const float r00 = c2w[0], r01 = c2w[1], r02 = c2w[2], tx = c2w[3];
  const float r10 = c2w[4], r11 = c2w[5], r12 = c2w[6], ty = c2w[7];
  const float r20 = c2w[8], r21 = c2w[9], r22 = c2w[10], tz = c2w[11];
  parallel_for(H, hw_threads(), [=](int64_t j0, int64_t j1) {
    for (int64_t j = j0; j < j1; ++j) {
      const float dy = -((float)j - H * 0.5f) / focal;
      float* od = rays_d + j * W * 3;
      float* oo = rays_o + j * W * 3;
      for (int64_t i = 0; i < W; ++i) {
        const float dx = ((float)i - W * 0.5f) / focal;
        // world dir = R * [dx, dy, -1]
        od[i * 3 + 0] = r00 * dx + r01 * dy - r02;
        od[i * 3 + 1] = r10 * dx + r11 * dy - r12;
        od[i * 3 + 2] = r20 * dx + r21 * dy - r22;
        oo[i * 3 + 0] = tx;
        oo[i * 3 + 1] = ty;
        oo[i * 3 + 2] = tz;
      }
    }
  });
}

// RGBA [N,4] in [0,1] → RGB over white [N,3]: rgb*a + (1-a).
void nerf_composite_white(const float* rgba, int64_t n, float* rgb) {
  parallel_for(n, hw_threads(), [=](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      const float a = rgba[k * 4 + 3];
      for (int c = 0; c < 3; ++c)
        rgb[k * 3 + c] = rgba[k * 4 + c] * a + (1.0f - a);
    }
  });
}

// Bilinear resize (H,W,C) f32 → (h,w,C), torch align_corners=false.
void nerf_resize_bilinear(const float* src, int32_t H, int32_t W, int32_t C,
                          float* dst, int32_t h, int32_t w) {
  const float sy = (float)H / h;
  const float sx = (float)W / w;
  parallel_for(h, hw_threads(), [=](int64_t y0_, int64_t y1_) {
    for (int64_t y = y0_; y < y1_; ++y) {
      float fy = std::max(((float)y + 0.5f) * sy - 0.5f, 0.0f);
      int64_t iy0 = (int64_t)fy;
      int64_t iy1 = std::min<int64_t>(iy0 + 1, H - 1);
      float wy1 = fy - iy0, wy0 = 1.0f - wy1;
      for (int64_t x = 0; x < w; ++x) {
        float fx = std::max(((float)x + 0.5f) * sx - 0.5f, 0.0f);
        int64_t ix0 = (int64_t)fx;
        int64_t ix1 = std::min<int64_t>(ix0 + 1, W - 1);
        float wx1 = fx - ix0, wx0 = 1.0f - wx1;
        const float* p00 = src + (iy0 * W + ix0) * C;
        const float* p01 = src + (iy0 * W + ix1) * C;
        const float* p10 = src + (iy1 * W + ix0) * C;
        const float* p11 = src + (iy1 * W + ix1) * C;
        float* out = dst + (y * w + x) * C;
        for (int32_t c = 0; c < C; ++c) {
          out[c] = wy0 * (wx0 * p00[c] + wx1 * p01[c]) +
                   wy1 * (wx0 * p10[c] + wx1 * p11[c]);
        }
      }
    }
  });
}

// Gather B rows of (rays_o, rays_d, targets) — all (N,3) — into contiguous
// batch buffers, padding rows past n_idx with row 0 (mask handled upstream).
void nerf_gather_batch(const float* rays_o, const float* rays_d,
                       const float* targets, const int64_t* idx, int64_t n_idx,
                       int64_t batch, float* out_o, float* out_d,
                       float* out_t) {
  parallel_for(batch, hw_threads(), [=](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      int64_t src = (k < n_idx) ? idx[k] : 0;
      std::memcpy(out_o + k * 3, rays_o + src * 3, 3 * sizeof(float));
      std::memcpy(out_d + k * 3, rays_d + src * 3, 3 * sizeof(float));
      std::memcpy(out_t + k * 3, targets + src * 3, 3 * sizeof(float));
    }
  });
}

}  // extern "C"
