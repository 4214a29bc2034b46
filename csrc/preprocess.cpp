// Native host-side image preprocessing for the data loader.
//
// The reference leans on OpenCV's C++ kernels for resize/letterbox
// (cv2.resize INTER_LINEAR, /root/reference/yolov3/utils/augmentations.py:111-143);
// cv2 is not in this image, so this small library supplies the same
// half-pixel bilinear resize + letterbox padding natively, loaded via ctypes
// (see adaptiveisp_tpu/data/native.py).  Multi-threaded over rows.
//
// All images are HWC float32.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// cv2-compatible (half-pixel centers) bilinear resize, HWC f32.
void resize_bilinear_f32(const float* src, int64_t sh, int64_t sw, int64_t c,
                         float* dst, int64_t dh, int64_t dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;

  auto run_rows = [&](int64_t y0, int64_t y1) {
    std::vector<int64_t> x0s(dw), x1s(dw);
    std::vector<float> wxs(dw);
    for (int64_t x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int64_t xf = static_cast<int64_t>(std::floor(fx));
      wxs[x] = static_cast<float>(fx - xf);
      x0s[x] = std::clamp<int64_t>(xf, 0, sw - 1);
      x1s[x] = std::clamp<int64_t>(xf + 1, 0, sw - 1);
    }
    for (int64_t y = y0; y < y1; ++y) {
      double fy = (y + 0.5) * sy - 0.5;
      int64_t yf = static_cast<int64_t>(std::floor(fy));
      float wy = static_cast<float>(fy - yf);
      int64_t yr0 = std::clamp<int64_t>(yf, 0, sh - 1);
      int64_t yr1 = std::clamp<int64_t>(yf + 1, 0, sh - 1);
      const float* r0 = src + yr0 * sw * c;
      const float* r1 = src + yr1 * sw * c;
      float* out = dst + y * dw * c;
      for (int64_t x = 0; x < dw; ++x) {
        const float wx = wxs[x];
        const float* p00 = r0 + x0s[x] * c;
        const float* p01 = r0 + x1s[x] * c;
        const float* p10 = r1 + x0s[x] * c;
        const float* p11 = r1 + x1s[x] * c;
        for (int64_t k = 0; k < c; ++k) {
          float top = p00[k] * (1.f - wx) + p01[k] * wx;
          float bot = p10[k] * (1.f - wx) + p11[k] * wx;
          out[x * c + k] = top * (1.f - wy) + bot * wy;
        }
      }
    }
  };

  int64_t n_threads = std::min<int64_t>(
      dh, std::max(1u, std::thread::hardware_concurrency()));
  if (n_threads <= 1 || dh < 64) {
    run_rows(0, dh);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (dh + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t y0 = t * chunk, y1 = std::min(dh, y0 + chunk);
    if (y0 >= y1) break;
    threads.emplace_back(run_rows, y0, y1);
  }
  for (auto& th : threads) th.join();
}

// Copy `src` (HWC f32) into `dst` at (top, left); dst prefilled by caller.
void paste_f32(const float* src, int64_t sh, int64_t sw, int64_t c,
               float* dst, int64_t dh, int64_t dw, int64_t top,
               int64_t left) {
  for (int64_t y = 0; y < sh; ++y) {
    std::memcpy(dst + ((y + top) * dw + left) * c, src + y * sw * c,
                sizeof(float) * sw * c);
  }
}

// Fill an HWC f32 buffer with a constant per-channel colour.
void fill_f32(float* dst, int64_t h, int64_t w, int64_t c,
              const float* color) {
  for (int64_t k = 0; k < c; ++k) {
    if (color[k] != color[0]) {
      // per-pixel path
      for (int64_t i = 0; i < h * w; ++i)
        for (int64_t j = 0; j < c; ++j) dst[i * c + j] = color[j];
      return;
    }
  }
  std::fill(dst, dst + h * w * c, color[0]);
}

}  // extern "C"
