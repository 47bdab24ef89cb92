// demon_native — C++ data-plane kernels for the host-side input pipeline.
//
// TPU-native counterpart of the reference's C++ reader internals
// (multivih5datareaderop/multivih5datareader.cpp): codec decode
// (LZ4+fp16 depth, WebP images), resize, and the per-pixel reprojection
// loops (flow render, depth-visibility mask, ray_length->camera_z).
// The device math lives in XLA/Pallas; this library keeps the host decode
// path off the Python interpreter. Exposed as a plain C ABI consumed via
// ctypes (demon_tpu/data/_native.py); every entry point has a numpy
// fallback so the library is an accelerator, not a dependency.
//
// Build: make -C native   (links libwebp and liblz4 from the system)

#include <cmath>
#include <cstdint>
#include <cstring>

#include <webp/decode.h>

// liblz4 runtime API (headers not shipped in this image; the C ABI of
// LZ4_decompress_safe is stable since 1.7)
extern "C" int LZ4_decompress_safe(const char* src, char* dst,
                                   int compressedSize, int dstCapacity);

namespace {

// IEEE 754 half -> float (round-to-nearest semantics preserved: the bit
// pattern maps exactly; no rounding is involved in widening)
inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t mant = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      // value = mant * 2^-24; after s shifts the hidden bit sits at
      // bit 10, so the unbiased exponent is -15 - s + 1 (NOT -15 - s:
      // the first shift creates the hidden one, it doesn't halve)
      int shift = 0;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        ++shift;
      }
      mant &= 0x3FFu;
      bits = sign | ((uint32_t)(127 - 15 - shift + 1) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

struct Mat3 {
  double m[9];  // row-major
  double at(int r, int c) const { return m[3 * r + c]; }
};

// world-from-cam1 point -> image2 pixel; returns z2
inline void project(const Mat3& P2r, const double* P2t, const float X[3],
                    float* u, float* v, float* z) {
  double x = P2r.at(0, 0) * X[0] + P2r.at(0, 1) * X[1] + P2r.at(0, 2) * X[2] + P2t[0];
  double y = P2r.at(1, 0) * X[0] + P2r.at(1, 1) * X[1] + P2r.at(1, 2) * X[2] + P2t[1];
  double w = P2r.at(2, 0) * X[0] + P2r.at(2, 1) * X[1] + P2r.at(2, 2) * X[2] + P2t[2];
  *u = (float)(x / w);
  *v = (float)(y / w);
  *z = (float)w;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// codecs
// ---------------------------------------------------------------------------

// LZ4-decode `src` into `count` halfs and widen to float32. Returns 0 on
// success (reference decode path: multivih5datareader.cpp:1467-1486).
int demon_lz4half_to_float(const char* src, int src_size, float* dst,
                           int count) {
  uint16_t* tmp = new uint16_t[count];
  int n = LZ4_decompress_safe(src, (char*)tmp, src_size,
                              count * (int)sizeof(uint16_t));
  if (n != count * (int)sizeof(uint16_t)) {
    delete[] tmp;
    return -1;
  }
#pragma omp parallel for schedule(static)
  for (int i = 0; i < count; ++i) dst[i] = half_to_float(tmp[i]);
  delete[] tmp;
  return 0;
}

int demon_webp_info(const uint8_t* data, size_t size, int* w, int* h) {
  return WebPGetInfo(data, size, w, h) ? 0 : -1;
}

// Decode WebP to tightly packed RGB; `out` must hold w*h*3 bytes.
// bypass_filtering/no_fancy_upsampling mirror the reference decoder
// config (multivih5datareader.cpp:1421-1423).
int demon_webp_decode_rgb(const uint8_t* data, size_t size, uint8_t* out,
                          int w, int h) {
  WebPDecoderConfig config;
  if (!WebPInitDecoderConfig(&config)) return -1;
  config.options.bypass_filtering = 1;
  config.options.no_fancy_upsampling = 1;
  config.output.colorspace = MODE_RGB;
  config.output.u.RGBA.rgba = out;
  config.output.u.RGBA.stride = 3 * w;
  config.output.u.RGBA.size = (size_t)(3 * w) * h;
  config.output.is_external_memory = 1;
  VP8StatusCode rc = WebPDecode(data, size, &config);
  return rc == VP8_STATUS_OK ? 0 : -(int)rc;
}

// ---------------------------------------------------------------------------
// resize
// ---------------------------------------------------------------------------

// Nearest resize of a float32 plane (cv2 INTER_NEAREST index rule
// src = floor(dst * scale); reference resize at
// multivih5datareader.cpp:1479-1486).
void demon_resize_nearest_f32(const float* src, int sh, int sw, float* dst,
                              int dh, int dw) {
  double sy = (double)sh / dh;
  double sx = (double)sw / dw;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    int yy = (int)(y * sy);
    if (yy >= sh) yy = sh - 1;
    for (int x = 0; x < dw; ++x) {
      int xx = (int)(x * sx);
      if (xx >= sw) xx = sw - 1;
      dst[y * dw + x] = src[yy * sw + xx];
    }
  }
}

// Area (box) resize of interleaved RGB u8 (cv2 INTER_AREA semantics for
// downscale: average over the fractional source box).
void demon_resize_area_rgb8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                            int dh, int dw) {
  double sy = (double)sh / dh;
  double sx = (double)sw / dw;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    double y0 = y * sy, y1 = (y + 1) * sy;
    int iy0 = (int)y0, iy1 = (int)std::ceil(y1);
    if (iy1 > sh) iy1 = sh;
    for (int x = 0; x < dw; ++x) {
      double x0 = x * sx, x1 = (x + 1) * sx;
      int ix0 = (int)x0, ix1 = (int)std::ceil(x1);
      if (ix1 > sw) ix1 = sw;
      double acc[3] = {0, 0, 0};
      double area = 0;
      for (int yy = iy0; yy < iy1; ++yy) {
        double wy = 1.0;
        if (yy < y0) wy -= y0 - yy;
        if (yy + 1 > y1) wy -= yy + 1 - y1;
        for (int xx = ix0; xx < ix1; ++xx) {
          double wx = 1.0;
          if (xx < x0) wx -= x0 - xx;
          if (xx + 1 > x1) wx -= xx + 1 - x1;
          double w = wx * wy;
          const uint8_t* p = src + 3 * (yy * sw + xx);
          acc[0] += w * p[0];
          acc[1] += w * p[1];
          acc[2] += w * p[2];
          area += w;
        }
      }
      uint8_t* q = dst + 3 * (y * dw + x);
      for (int c = 0; c < 3; ++c) {
        double v = acc[c] / area + 0.5;
        q[c] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// reprojection kernels
// ---------------------------------------------------------------------------

// Render pixel-unit optical flow cam1->cam2 (NaN at invalid depth);
// layout [h, w, 2]. K* are normalized [fx fy cx cy]; R row-major
// world-to-cam; math matches the reference computeFlow
// (multivih5datareader.cpp:369-424).
void demon_compute_flow(const float* depth, int h, int w, const double* K1n,
                        const double* R1, const double* t1, const double* K2n,
                        const double* R2, const double* t2, float* flow) {
  double fx1 = K1n[0] * w, fy1 = K1n[1] * h, cx1 = K1n[2] * w, cy1 = K1n[3] * h;
  double fx2 = K2n[0] * w, fy2 = K2n[1] * h, cx2 = K2n[2] * w, cy2 = K2n[3] * h;
  Mat3 R1m, P2r;
  std::memcpy(R1m.m, R1, sizeof(R1m.m));
  // P2 = K2 [R2 | t2] composed with world transform below
  double P2t[3];
  {
    Mat3 R2m;
    std::memcpy(R2m.m, R2, sizeof(R2m.m));
    for (int c = 0; c < 3; ++c) {
      P2r.m[0 * 3 + c] = fx2 * R2m.at(0, c) + cx2 * R2m.at(2, c);
      P2r.m[1 * 3 + c] = fy2 * R2m.at(1, c) + cy2 * R2m.at(2, c);
      P2r.m[2 * 3 + c] = R2m.at(2, c);
    }
    P2t[0] = fx2 * t2[0] + cx2 * t2[2];
    P2t[1] = fy2 * t2[1] + cy2 * t2[2];
    P2t[2] = t2[2];
  }
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float d = depth[y * w + x];
      float* f = flow + 2 * (y * w + x);
      if (!(std::isfinite(d) && d > 0)) {
        f[0] = f[1] = NAN;
        continue;
      }
      double px = x + 0.5, py = y + 0.5;
      // cam1 point
      float Xc[3] = {(float)(d * (px - cx1) / fx1),
                     (float)(d * (py - cy1) / fy1), d};
      // world point: R1^T (Xc - t1)
      float Xw[3];
      float tmp[3] = {(float)(Xc[0] - t1[0]), (float)(Xc[1] - t1[1]),
                      (float)(Xc[2] - t1[2])};
      for (int r = 0; r < 3; ++r)
        Xw[r] = (float)(R1m.at(0, r) * tmp[0] + R1m.at(1, r) * tmp[1] +
                        R1m.at(2, r) * tmp[2]);
      float u, v, z;
      project(P2r, P2t, Xw, &u, &v, &z);
      f[0] = (float)(u - px);
      f[1] = (float)(v - py);
    }
  }
}

// Depth-visibility mask (reference computeDepthmask,
// multivih5datareader.cpp:430-498); layout [h, w] of {0,1}.
void demon_compute_depthmask(const float* depth, int h, int w,
                             const double* K1n, const double* R1,
                             const double* t1, const double* K2n,
                             const double* R2, const double* t2, int border1,
                             int border2, float* mask) {
  double fx1 = K1n[0] * w, fy1 = K1n[1] * h, cx1 = K1n[2] * w, cy1 = K1n[3] * h;
  double fx2 = K2n[0] * w, fy2 = K2n[1] * h, cx2 = K2n[2] * w, cy2 = K2n[3] * h;
  Mat3 R1m, P2r;
  std::memcpy(R1m.m, R1, sizeof(R1m.m));
  double P2t[3];
  {
    Mat3 R2m;
    std::memcpy(R2m.m, R2, sizeof(R2m.m));
    for (int c = 0; c < 3; ++c) {
      P2r.m[0 * 3 + c] = fx2 * R2m.at(0, c) + cx2 * R2m.at(2, c);
      P2r.m[1 * 3 + c] = fy2 * R2m.at(1, c) + cy2 * R2m.at(2, c);
      P2r.m[2 * 3 + c] = R2m.at(2, c);
    }
    P2t[0] = fx2 * t2[0] + cx2 * t2[2];
    P2t[1] = fy2 * t2[1] + cy2 * t2[2];
    P2t[2] = t2[2];
  }
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float* m = mask + y * w + x;
      if (x < border1 || y < border1 || x >= w - border1 || y >= h - border1) {
        *m = 0;
        continue;
      }
      float d = depth[y * w + x];
      if (!(std::isfinite(d) && d > 0)) {
        *m = 0;
        continue;
      }
      double px = x + 0.5, py = y + 0.5;
      float Xc[3] = {(float)(d * (px - cx1) / fx1),
                     (float)(d * (py - cy1) / fy1), d};
      float Xw[3];
      float tmp[3] = {(float)(Xc[0] - t1[0]), (float)(Xc[1] - t1[1]),
                      (float)(Xc[2] - t1[2])};
      for (int r = 0; r < 3; ++r)
        Xw[r] = (float)(R1m.at(0, r) * tmp[0] + R1m.at(1, r) * tmp[1] +
                        R1m.at(2, r) * tmp[2]);
      float u, v, z;
      project(P2r, P2t, Xw, &u, &v, &z);
      *m = (u >= border2 && v >= border2 && u < w - border2 && v < h - border2)
               ? 1.0f
               : 0.0f;
    }
  }
}

// ray_length -> camera_z conversion (reference
// multivih5datareader.cpp:1488-1512); in-place on [h, w].
void demon_ray_length_to_z(float* depth, int h, int w, const double* K1n) {
  double fx = K1n[0] * w, fy = K1n[1] * h, cx = K1n[2] * w, cy = K1n[3] * h;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double rx = ((x + 0.5) - cx) / fx;
      double ry = ((y + 0.5) - cy) / fy;
      depth[y * w + x] /= (float)std::sqrt(rx * rx + ry * ry + 1.0);
    }
  }
}

// ---------------------------------------------------------------------------
// batch-item assembly (the per-item hot path of the builder thread;
// called via ctypes so the GIL is released and builder threads scale)
// ---------------------------------------------------------------------------

// Fused u8->float conversion + RGBRGB concat + rot180/mirror flip.
// img1/img2: [h, w, 3] uint8; out: [h, w, 6] float32 in
// [range_min, range_min + range_span].
void demon_assemble_image_pair(const uint8_t* img1, const uint8_t* img2,
                               int h, int w, float range_min,
                               float range_span, int rot180, int mirror_x,
                               float* out) {
  const float scale = range_span / 255.0f;
// (no omp here: builder THREADS are the parallelism; nested omp
  // teams would oversubscribe the host cores)
  for (int y = 0; y < h; ++y) {
    int sy = rot180 ? (h - 1 - y) : y;
    for (int x = 0; x < w; ++x) {
      int sx = x;
      if (rot180) sx = w - 1 - x;
      if (mirror_x) sx = w - 1 - sx;
      const uint8_t* p1 = img1 + 3 * (sy * w + sx);
      const uint8_t* p2 = img2 + 3 * (sy * w + sx);
      float* o = out + 6 * (y * w + x);
      for (int c = 0; c < 3; ++c) {
        o[c] = p1[c] * scale + range_min;
        o[3 + c] = p2[c] * scale + range_min;
      }
    }
  }
}

// Fused depth postprocessing: invalidation (0 / min / max -> NaN), scale,
// optional inversion, rot180/mirror flips. src: [h, w] float32.
void demon_prepare_depth(const float* src, int h, int w, float scale,
                         int inverse, float min_d, float max_d, int rot180,
                         int mirror_x, float* out) {
// (no omp here: builder THREADS are the parallelism; nested omp
  // teams would oversubscribe the host cores)
  for (int y = 0; y < h; ++y) {
    int sy = rot180 ? (h - 1 - y) : y;
    for (int x = 0; x < w; ++x) {
      int sx = x;
      if (rot180) sx = w - 1 - x;
      if (mirror_x) sx = w - 1 - sx;
      float d = src[sy * w + sx];
      float v;
      if (d == 0.0f || (max_d > 0 && d > max_d) || (min_d > 0 && d < min_d) ||
          !std::isfinite(d)) {
        v = NAN;
      } else {
        v = d * scale;
        if (inverse) v = 1.0f / v;
      }
      out[y * w + x] = v;
    }
  }
}

// Whole-batch tensor fill: one GIL-released call assembles every item's
// IMAGE_PAIR and DEPTH with an OpenMP team across items. Batch granularity
// is what makes python builder threads scale — per-item ctypes calls
// bounce the GIL every ~0.3 ms, and the convoying caps throughput well
// below core count (the reference gets the same effect by keeping whole
// batches inside C++ builder threads, multivih5datareader.cpp:1522-1973).
// img1s/img2s/depths are per-item pointers; any null entry is skipped
// (python fills that slot via the fallback path). out_images / out_depths
// may each be null when that output is not requested.
void demon_build_batch(const uint8_t** img1s, const uint8_t** img2s,
                       const float** depths, int n, int h, int w,
                       float range_min, float range_span,
                       const float* depth_scales, int inverse, float min_d,
                       float max_d, const uint8_t* rot180s,
                       const uint8_t* mirror_xs, float* out_images,
                       float* out_depths) {
#pragma omp parallel for schedule(dynamic, 1)
  for (int i = 0; i < n; ++i) {
    if (out_images && img1s[i] && img2s[i]) {
      demon_assemble_image_pair(img1s[i], img2s[i], h, w, range_min,
                                range_span, rot180s[i], mirror_xs[i],
                                out_images + (size_t)i * h * w * 6);
    }
    if (out_depths && depths[i]) {
      demon_prepare_depth(depths[i], h, w, depth_scales[i], inverse, min_d,
                          max_d, rot180s[i], mirror_xs[i],
                          out_depths + (size_t)i * h * w);
    }
  }
}

int demon_native_version(void) { return 3; }

}  // extern "C"
