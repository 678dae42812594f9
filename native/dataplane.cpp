// Native host data-plane for the BOP pipeline.
//
// The hot per-sample host work (reference: two cv2.warpAffine calls + HSV /
// normalize per item, libs/transform.py + libs/dzi_libs.py) implemented as a
// small dependency-free C++ library: inverse-mapped bilinear/nearest affine
// warps and a fused BGR-u8 -> normalized-RGB-f32 conversion. Bound from
// Python via ctypes (no pybind11 in this image). Row-partitioned across a
// caller-chosen number of std::threads.
//
// Build: g++ -O3 -march=native -shared -fPIC dataplane.cpp -o libdataplane.so -lpthread
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

struct Affine {
  // dst -> src mapping (inverse of the user-supplied src -> dst matrix)
  double a, b, c, d, e, f;
};

Affine invert(const double* M) {
  // M is 2x3 row-major src->dst
  double det = M[0] * M[4] - M[1] * M[3];
  if (std::abs(det) < 1e-12) det = det < 0 ? -1e-12 : 1e-12;
  Affine inv;
  inv.a = M[4] / det;
  inv.b = -M[1] / det;
  inv.d = -M[3] / det;
  inv.e = M[0] / det;
  inv.c = -(inv.a * M[2] + inv.b * M[5]);
  inv.f = -(inv.d * M[2] + inv.e * M[5]);
  return inv;
}

template <typename Fn>
void parallel_rows(int rows, int n_threads, Fn&& fn) {
  if (n_threads <= 1) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> ts;
  int chunk = (rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int y0 = t * chunk, y1 = std::min(rows, y0 + chunk);
    if (y0 >= y1) break;
    ts.emplace_back([=, &fn] { fn(y0, y1); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Bilinear warp of an interleaved uint8 image (C channels).
// M: 2x3 row-major src->dst affine. border: per-channel fill value.
void warp_affine_u8(const uint8_t* src, int sh, int sw, int ch,
                    uint8_t* dst, int dh, int dw,
                    const double* M, const uint8_t* border, int n_threads) {
  Affine inv = invert(M);
  parallel_rows(dh, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      for (int x = 0; x < dw; ++x) {
        double sx = inv.a * x + inv.b * y + inv.c;
        double sy = inv.d * x + inv.e * y + inv.f;
        int x0 = (int)std::floor(sx), y0i = (int)std::floor(sy);
        uint8_t* out = dst + ((size_t)y * dw + x) * ch;
        if (x0 < -1 || y0i < -1 || x0 >= sw || y0i >= sh) {
          std::memcpy(out, border, ch);
          continue;
        }
        double fx = sx - x0, fy = sy - y0i;
        int x1 = x0 + 1, y1i = y0i + 1;
        for (int c = 0; c < ch; ++c) {
          auto px = [&](int yy, int xx) -> double {
            if (xx < 0 || yy < 0 || xx >= sw || yy >= sh) return border[c];
            return src[((size_t)yy * sw + xx) * ch + c];
          };
          double v = px(y0i, x0) * (1 - fx) * (1 - fy) +
                     px(y0i, x1) * fx * (1 - fy) +
                     px(y1i, x0) * (1 - fx) * fy +
                     px(y1i, x1) * fx * fy;
          out[c] = (uint8_t)std::lround(std::min(255.0, std::max(0.0, v)));
        }
      }
    }
  });
}

// Nearest-neighbor warp of an int32 label image.
void warp_affine_i32(const int32_t* src, int sh, int sw,
                     int32_t* dst, int dh, int dw,
                     const double* M, int32_t border, int n_threads) {
  Affine inv = invert(M);
  parallel_rows(dh, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      for (int x = 0; x < dw; ++x) {
        double sx = inv.a * x + inv.b * y + inv.c;
        double sy = inv.d * x + inv.e * y + inv.f;
        int xi = (int)std::lround(sx), yi = (int)std::lround(sy);
        dst[(size_t)y * dw + x] =
            (xi < 0 || yi < 0 || xi >= sw || yi >= sh)
                ? border : src[(size_t)yi * sw + xi];
      }
    }
  });
}

// Fused BGR uint8 -> normalized RGB float32: (px/255 - mean) / std.
void normalize_bgr_u8(const uint8_t* src, int h, int w,
                      const float* mean, const float* stddev,
                      float* dst, int n_threads) {
  float inv_std[3] = {1.f / stddev[0], 1.f / stddev[1], 1.f / stddev[2]};
  parallel_rows(h, n_threads, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      const uint8_t* s = src + (size_t)y * w * 3;
      float* d = dst + (size_t)y * w * 3;
      for (int x = 0; x < w; ++x) {
        // BGR -> RGB swap
        d[x * 3 + 0] = (s[x * 3 + 2] / 255.f - mean[0]) * inv_std[0];
        d[x * 3 + 1] = (s[x * 3 + 1] / 255.f - mean[1]) * inv_std[1];
        d[x * 3 + 2] = (s[x * 3 + 0] / 255.f - mean[2]) * inv_std[2];
      }
    }
  });
}

}  // extern "C"
