// Host-side synthetic-view renderer for host-stage detectors (MSER).
//
// Mirrors the device render program (mods_tpu/pipeline.py _make_render_fn
// / synth-detection.cpp:236-430 semantics): per view, an inverse-map
// bilinear rotation warp to (hr, wr) with gray-128 fill, an optional
// separable replicate-border Gaussian anti-alias blur (OpenCV
// getGaussianKernel-style sampled taps, size int(6*sigma+1) forced odd,
// min 3 — mods_tpu/ops/gaussian.py gauss_kernel_1d), then the tilt/zoom
// squash warp to the padded canvas (hc, wc).
//
// Rationale: the MSER component tree is inherently sequential and runs on
// the host (native/mser.cpp); shipping device-rendered views back over
// the host<->device link is the single most expensive transfer in the
// pipeline, so the host re-renders the views itself.  OpenMP parallelizes
// across views and rows.  Compiled via ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline float bilinear(const float* img, int h, int w, float x, float y,
                      float fill) {
  // matches ops/warp.py bilinear_sample: valid iff floor(x) in [0, w-2]
  // and floor(y) in [0, h-2]
  const float xf = std::floor(x), yf = std::floor(y);
  const int x0 = (int)xf, y0 = (int)yf;
  if (x0 < 0 || y0 < 0 || x0 >= w - 1 || y0 >= h - 1) return fill;
  const float wx = x - xf, wy = y - yf;
  const float* row = img + (size_t)y0 * w + x0;
  const float p00 = row[0], p01 = row[1];
  const float p10 = row[w], p11 = row[w + 1];
  const float top = p00 + wx * (p01 - p00);
  const float bot = p10 + wx * (p11 - p10);
  return top + wy * (bot - top);
}

void warp_affine(const float* img, int h, int w, const float* m /*2x3*/,
                 float* out, int oh, int ow, int ow_stride, float fill) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < oh; ++y) {
    float* orow = out + (size_t)y * ow_stride;
    const float sx0 = m[1] * y + m[2];
    const float sy0 = m[4] * y + m[5];
    for (int x = 0; x < ow; ++x) {
      orow[x] = bilinear(img, h, w, m[0] * x + sx0, m[3] * x + sy0, fill);
    }
  }
}

// out[r, c] = in[r, c + slope*r + off] with linear interpolation along x
// and `fill` outside [0, w) — the device _shear_x (ops/warp.py) twin.
// `flip` reads the source reversed in both axes (rotation-by-pi fold).
void shear_x_pass(const float* in, int h, int w, float slope, float off,
                  float* out, int out_w, float fill, int flip) {
#pragma omp parallel for schedule(static)
  for (int r = 0; r < h; ++r) {
    const float s = slope * (float)r + off;
    const float o = std::floor(s);
    const float wt = s - o;
    const int oi = (int)o;
    const float* irow =
        flip ? in + (size_t)(h - 1 - r) * w : in + (size_t)r * w;
    float* orow = out + (size_t)r * out_w;
    for (int c = 0; c < out_w; ++c) {
      const int j0 = c + oi;
      const int j1 = j0 + 1;
      const int k0 = flip ? (w - 1 - j0) : j0;
      const int k1 = flip ? (w - 1 - j1) : j1;
      const float p0 = (j0 >= 0 && j0 < w) ? irow[k0] : fill;
      const float p1 = (j1 >= 0 && j1 < w) ? irow[k1] : fill;
      orow[c] = p0 * (1.0f - wt) + p1 * wt;
    }
  }
}

void transpose(const float* in, int h, int w, float* out) {
#pragma omp parallel for schedule(static)
  for (int r = 0; r < h; ++r)
    for (int c = 0; c < w; ++c) out[(size_t)c * h + r] = in[(size_t)r * w + c];
}

// Rotation warp as three x-shears with transposes between — mirrors the
// device shear_rotate (ops/warp.py): theta from the inverse map, flip
// fold for |theta| > pi/2, alpha = tan(theta/2), beta = -sin(theta).
void shear_rotate(const float* img, int h, int w, const float* m /*2x3*/,
                  float* out, int oh, int ow, float fill,
                  std::vector<float>& buf_a, std::vector<float>& buf_b) {
  const float a = m[0], c_ = m[3], tx = m[2], ty = m[5];
  float theta = std::atan2(-c_, a);
  int flip = 0;
  float txe = tx, tye = ty;
  if (std::fabs(theta) > (float)(M_PI / 2 + 1e-6)) {
    flip = 1;
    theta = theta - (theta > 0 ? (float)M_PI : -(float)M_PI);
    txe = (float)(w - 1) - tx;
    tye = (float)(h - 1) - ty;
  }
  const float alpha = std::tan(theta / 2.0f);
  const float beta = -std::sin(theta);
  const int wa = ow + h + 8;
  buf_a.resize((size_t)h * wa);          // stage A: (h, wa)
  shear_x_pass(img, h, w, alpha, txe - alpha * tye, buf_a.data(), wa,
               fill, flip);
  buf_b.resize((size_t)wa * h);          // A^T: (wa, h)
  transpose(buf_a.data(), h, wa, buf_b.data());
  buf_a.resize((size_t)wa * oh);         // stage B on A^T: (wa, oh)
  shear_x_pass(buf_b.data(), wa, h, beta, tye, buf_a.data(), oh, fill, 0);
  buf_b.resize((size_t)oh * wa);         // B^T: (oh, wa)
  transpose(buf_a.data(), wa, oh, buf_b.data());
  shear_x_pass(buf_b.data(), oh, wa, alpha, 0.0f, out, ow, fill, 0);
}

// Axis-aligned separable resample with index clamping (replicate) — the
// device separable_scale twin: y-pass then x-pass.
void separable_scale(const float* in, int h, int w, float sx_inv,
                     float sy_inv, float* out, int oh, int ow,
                     int ow_stride, std::vector<float>& buf) {
  buf.resize((size_t)oh * w);
#pragma omp parallel for schedule(static)
  for (int r = 0; r < oh; ++r) {
    const float sy = sy_inv * (float)r;
    int i0 = (int)std::floor(sy);
    const float wy = sy - std::floor(sy);
    if (i0 < 0) i0 = 0;
    if (i0 > h - 1) i0 = h - 1;
    int i1 = i0 + 1 > h - 1 ? h - 1 : i0 + 1;
    const float* r0 = in + (size_t)i0 * w;
    const float* r1 = in + (size_t)i1 * w;
    float* orow = buf.data() + (size_t)r * w;
    for (int c = 0; c < w; ++c)
      orow[c] = r0[c] * (1.0f - wy) + r1[c] * wy;
  }
#pragma omp parallel for schedule(static)
  for (int r = 0; r < oh; ++r) {
    const float* irow = buf.data() + (size_t)r * w;
    float* orow = out + (size_t)r * ow_stride;
    for (int c = 0; c < ow; ++c) {
      const float sx = sx_inv * (float)c;
      int j0 = (int)std::floor(sx);
      const float wx = sx - std::floor(sx);
      if (j0 < 0) j0 = 0;
      if (j0 > w - 1) j0 = w - 1;
      int j1 = j0 + 1 > w - 1 ? w - 1 : j0 + 1;
      orow[c] = irow[j0] * (1.0f - wx) + irow[j1] * wx;
    }
  }
}

// Fused anti-alias blur + axis-aligned squash: evaluates the blurred
// image ONLY at output sample positions.  Bit-faithful to
// blur_separable followed by separable_scale (up to fp association):
// bilinear(blur(f))(s) == (taps conv [1-w, w])(f) at floor(s), so each
// output pixel applies the combined (taps+1)-tap kernel.  For the dense
// tilt ladders (sigma_x up to ~29, squash 10:1) this cuts the blur work
// by the squash factor — the host blur at full rotated resolution was
// ~5.3 GMAC per MSER rung image (r5 measurement), dominating the
// host-stage critical path.
void blur_scale_fused(const float* in, int h, int w,
                      const std::vector<float>& ky,
                      const std::vector<float>& kx, float sy_inv,
                      float sx_inv, float* out, int oh, int ow,
                      int ow_stride, std::vector<float>& buf) {
  const int ny = (int)ky.size(), nx = (int)kx.size();
  const int hy = ny / 2, hx = nx / 2;
  buf.resize((size_t)oh * w);
  // pass 1: combined y-blur + y-resample, full width
#pragma omp parallel for schedule(static)
  for (int r = 0; r < oh; ++r) {
    const float sy = sy_inv * (float)r;
    int i0 = (int)std::floor(sy);
    const float wy = sy - std::floor(sy);
    if (i0 < 0) i0 = 0;
    if (i0 > h - 1) i0 = h - 1;
    float* orow = buf.data() + (size_t)r * w;
    for (int x = 0; x < w; ++x) orow[x] = 0.0f;
    for (int k = 0; k <= ny; ++k) {
      const float t = (k < ny ? ky[k] * (1.0f - wy) : 0.0f)
                    + (k > 0 ? ky[k - 1] * wy : 0.0f);
      int yy = i0 + k - hy;
      if (yy < 0) yy = 0;
      if (yy >= h) yy = h - 1;
      const float* irow = in + (size_t)yy * w;
      for (int x = 0; x < w; ++x) orow[x] += t * irow[x];
    }
  }
  // pass 2: combined x-blur + x-resample
#pragma omp parallel for schedule(static)
  for (int r = 0; r < oh; ++r) {
    const float* irow = buf.data() + (size_t)r * w;
    float* orow = out + (size_t)r * ow_stride;
    for (int c = 0; c < ow; ++c) {
      const float sx = sx_inv * (float)c;
      int j0 = (int)std::floor(sx);
      const float wx = sx - std::floor(sx);
      if (j0 < 0) j0 = 0;
      if (j0 > w - 1) j0 = w - 1;
      float acc = 0.0f;
      for (int k = 0; k <= nx; ++k) {
        const float t = (k < nx ? kx[k] * (1.0f - wx) : 0.0f)
                      + (k > 0 ? kx[k - 1] * wx : 0.0f);
        int xx = j0 + k - hx;
        if (xx < 0) xx = 0;
        if (xx >= w) xx = w - 1;
        acc += t * irow[xx];
      }
      orow[c] = acc;
    }
  }
}

std::vector<float> gauss_taps(float sigma) {
  int size = (int)(2.0f * 3.0f * sigma + 1.0f);
  if (size % 2 == 0) size += 1;
  if (size < 3) size = 3;
  const int half = size / 2;
  std::vector<float> taps(size);
  double sum = 0.0;
  for (int i = 0; i < size; ++i) {
    const double d = i - half;
    taps[i] = (float)std::exp(-(d * d) / (2.0 * sigma * sigma));
    sum += taps[i];
  }
  for (int i = 0; i < size; ++i) taps[i] = (float)(taps[i] / sum);
  return taps;
}

}  // namespace

extern "C" {

// Render V views of one group.  rot_inv: (V, 6) row-major 2x3 inverse
// rotation maps; out: (V, hc, wc) float32 pre-zeroed or not (fully
// overwritten up to valid extents, 128-filled elsewhere on the canvas).
// valid_hw: (V, 2) int32 (h_new, w_new) squash-stage extents.
// identity==1 copies img into the canvas corner (one view).
void mods_render_group(const float* img, int h, int w,
                       const float* rot_inv, int V, int hr, int wr,
                       int do_blur, float sigma_x, float sigma_y,
                       float sx_inv, float sy_inv, const int* valid_hw,
                       int hc, int wc, int identity, float* out) {
  if (identity) {
    for (int v = 0; v < V; ++v) {
      float* o = out + (size_t)v * hc * wc;
      for (int y = 0; y < hc; ++y) {
        float* row = o + (size_t)y * wc;
        const int ys = y < h ? y : h - 1;  // replicate last valid row
        std::memcpy(row, img + (size_t)ys * w, sizeof(float) * w);
        for (int x = w; x < wc; ++x) row[x] = row[w - 1];
      }
    }
    return;
  }
  std::vector<float> rot((size_t)hr * wr);
  std::vector<float> buf_a, buf_b, buf_s;
  for (int v = 0; v < V; ++v) {
    shear_rotate(img, h, w, rot_inv + (size_t)v * 6, rot.data(), hr, wr,
                 128.0f, buf_a, buf_b);
    float* o = out + (size_t)v * hc * wc;
    const int hv0 = valid_hw[v * 2], wv0 = valid_hw[v * 2 + 1];
    const int hv = hv0 < hc ? hv0 : hc, wv = wv0 < wc ? wv0 : wc;
    if (do_blur) {
      const std::vector<float> ky = gauss_taps(sigma_y);
      const std::vector<float> kx = gauss_taps(sigma_x);
      blur_scale_fused(rot.data(), hr, wr, ky, kx, sy_inv, sx_inv, o,
                       hv, wv, wc, buf_s);
    } else {
      separable_scale(rot.data(), hr, wr, sx_inv, sy_inv, o, hv, wv, wc,
                      buf_s);
    }
    // replicate the last valid row/col into the canvas padding — a
    // constant fill would manufacture an artificial edge at the valid
    // boundary (device render clamp_pad parity, pipeline.py)
    if (wv > 0) {
#pragma omp parallel for schedule(static)
      for (int y = 0; y < hv; ++y) {
        float* row = o + (size_t)y * wc;
        for (int x = wv; x < wc; ++x) row[x] = row[wv - 1];
      }
    }
    if (hv > 0) {
      const float* src = o + (size_t)(hv - 1) * wc;
#pragma omp parallel for schedule(static)
      for (int y = hv; y < hc; ++y) {
        std::memcpy(o + (size_t)y * wc, src, sizeof(float) * wc);
      }
    }
  }
}

}  // extern "C"
