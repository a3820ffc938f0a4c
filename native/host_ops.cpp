// Native host-side ops for the TPU inference engine.
//
// The reference engine's native code is its compute kernels (AVX/CUDA
// GEMM; SURVEY.md K1-K7) — on TPU that role belongs to the Pallas/Mosaic
// kernels. What legitimately remains on the host is image preparation and
// the host-side NMS oracle (reference P1/P3, SURVEY.md section 2.4);
// this library provides both at native speed, loaded via ctypes
// (runtime/native_bridge.py) with a numpy fallback.
//
// Build: make -C native   (produces libhost_ops.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Bilinear resize with half-pixel centers (matches cv2.INTER_LINEAR and
// the numpy fallback in preprocess.py). src: (h, w, c) f32 row-major.
void resize_bilinear_f32(const float* src, int h, int w, int c,
                         float* dst, int out_h, int out_w) {
  std::vector<int> x0(out_w), x1(out_w);
  std::vector<float> wx(out_w);
  for (int j = 0; j < out_w; ++j) {
    float xs = (j + 0.5f) * (float)w / out_w - 0.5f;
    xs = std::min(std::max(xs, 0.0f), (float)(w - 1));
    x0[j] = (int)xs;
    x1[j] = std::min(x0[j] + 1, w - 1);
    wx[j] = xs - x0[j];
  }
  for (int i = 0; i < out_h; ++i) {
    float ys = (i + 0.5f) * (float)h / out_h - 0.5f;
    ys = std::min(std::max(ys, 0.0f), (float)(h - 1));
    int y0 = (int)ys;
    int y1 = std::min(y0 + 1, h - 1);
    float wy = ys - y0;
    const float* r0 = src + (size_t)y0 * w * c;
    const float* r1 = src + (size_t)y1 * w * c;
    float* out = dst + (size_t)i * out_w * c;
    for (int j = 0; j < out_w; ++j) {
      const float* a = r0 + (size_t)x0[j] * c;
      const float* b = r0 + (size_t)x1[j] * c;
      const float* d = r1 + (size_t)x0[j] * c;
      const float* e = r1 + (size_t)x1[j] * c;
      float fx = wx[j];
      for (int k = 0; k < c; ++k) {
        float top = a[k] * (1.0f - fx) + b[k] * fx;
        float bot = d[k] * (1.0f - fx) + e[k] * fx;
        out[(size_t)j * c + k] = top * (1.0f - wy) + bot * wy;
      }
    }
  }
}

// uint8 HWC -> f32 HWC in [0,1] with resize fused (preprocess hot path).
void preprocess_u8(const uint8_t* src, int h, int w, int c,
                   float* dst, int out_h, int out_w) {
  std::vector<float> tmp((size_t)h * w * c);
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < tmp.size(); ++i) tmp[i] = src[i] * inv;
  resize_bilinear_f32(tmp.data(), h, w, c, dst, out_h, out_w);
}

static inline float iou(const float* a, const float* b) {
  float x1 = std::max(a[0], b[0]);
  float y1 = std::max(a[1], b[1]);
  float x2 = std::min(a[2], b[2]);
  float y2 = std::min(a[3], b[3]);
  float inter = std::max(x2 - x1, 0.0f) * std::max(y2 - y1, 0.0f);
  float ua = std::max(a[2] - a[0], 0.0f) * std::max(a[3] - a[1], 0.0f);
  float ub = std::max(b[2] - b[0], 0.0f) * std::max(b[3] - b[1], 0.0f);
  float u = ua + ub - inter;
  return u > 1e-9f ? inter / u : 0.0f;
}

// Greedy NMS over score-sorted candidates. boxes: (m, 4) xyxy f32,
// scores (m,) sorted descending by caller. Writes kept indices; returns
// the number kept (<= max_det).
int nms_greedy(const float* boxes, const float* scores, int m,
               float iou_thresh, float score_thresh,
               int* keep_out, int max_det) {
  int n_keep = 0;
  std::vector<char> suppressed(m, 0);
  for (int i = 0; i < m && n_keep < max_det; ++i) {
    if (suppressed[i] || scores[i] <= score_thresh) continue;
    keep_out[n_keep++] = i;
    for (int j = i + 1; j < m; ++j) {
      if (!suppressed[j] && iou(boxes + 4 * i, boxes + 4 * j) > iou_thresh)
        suppressed[j] = 1;
    }
  }
  return n_keep;
}

}  // extern "C"
