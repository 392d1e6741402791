// UniVid-TPU native host-side data-loader kernels.
//
// The TPU compute path is jax/XLA/Pallas; this module covers the
// host-side runtime the reference delegates to native code (decord /
// ffmpeg / torchvision C++ ops in its data loaders): frame resizing,
// normalisation and patch extraction that sit on the CPU critical path
// between video decode and device transfer. Exact numerical parity with
// the numpy fallbacks in univid_tpu/data (same half-pixel
// align_corners=false sampling as openvid._resize_bilinear and the same
// (ph, pw, c) inner patch order as packed_dataset.patchify_np).
//
// Plain C ABI, loaded via ctypes (univid_tpu/native/__init__.py). Built
// with `make -C native` or lazily by the ctypes loader.

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

template <typename SrcT>
void resize_bilinear(const SrcT* src, int sh, int sw, int c, float* dst,
                     int dh, int dw, float scale, float shift) {
  // Row/col source coordinates with half-pixel centers, clamped — the
  // same formula as the numpy fallback so fast path == slow path.
  for (int y = 0; y < dh; ++y) {
    float fy = std::min(std::max((y + 0.5f) * sh / dh - 0.5f, 0.0f),
                        float(sh - 1));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    const SrcT* row0 = src + size_t(y0) * sw * c;
    const SrcT* row1 = src + size_t(y1) * sw * c;
    float* out = dst + size_t(y) * dw * c;
    for (int x = 0; x < dw; ++x) {
      float fx = std::min(std::max((x + 0.5f) * sw / dw - 0.5f, 0.0f),
                          float(sw - 1));
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      const SrcT* p00 = row0 + size_t(x0) * c;
      const SrcT* p01 = row0 + size_t(x1) * c;
      const SrcT* p10 = row1 + size_t(x0) * c;
      const SrcT* p11 = row1 + size_t(x1) * c;
      for (int k = 0; k < c; ++k) {
        float top = float(p00[k]) * (1.0f - wx) + float(p01[k]) * wx;
        float bot = float(p10[k]) * (1.0f - wx) + float(p11[k]) * wx;
        out[size_t(x) * c + k] =
            (top * (1.0f - wy) + bot * wy) * scale + shift;
      }
    }
  }
}

}  // namespace

extern "C" {

// [sh, sw, c] float32 -> [dh, dw, c] float32 (y = resize(x)).
void uv_resize_bilinear_f32(const float* src, int sh, int sw, int c,
                            float* dst, int dh, int dw) {
  resize_bilinear(src, sh, sw, c, dst, dh, dw, 1.0f, 0.0f);
}

// [sh, sw, c] uint8 -> [dh, dw, c] float32, fused y = resize(x)*scale
// + shift (one pass instead of astype + resize + normalize).
void uv_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                           float* dst, int dh, int dw, float scale,
                           float shift) {
  resize_bilinear(src, sh, sw, c, dst, dh, dw, scale, shift);
}

// [h, w, c] float32 -> [(h/p)*(w/p), p*p*c] with (ph, pw, c) inner
// order (packed_dataset.patchify_np / BAGEL data_utils.patchify).
void uv_patchify_f32(const float* src, int h, int w, int c, int p,
                     float* dst) {
  int hp = h / p, wp = w / p;
  size_t patch_elems = size_t(p) * p * c;
  for (int i = 0; i < hp; ++i) {
    for (int j = 0; j < wp; ++j) {
      float* out = dst + (size_t(i) * wp + j) * patch_elems;
      for (int pi = 0; pi < p; ++pi) {
        const float* row = src + (size_t(i) * p + pi) * w * c +
                           size_t(j) * p * c;
        std::copy(row, row + size_t(p) * c,
                  out + size_t(pi) * p * c);
      }
    }
  }
}

// Normalise a uint8 frame in place to float32: y = x*scale + shift.
void uv_u8_to_f32_affine(const uint8_t* src, float* dst, int64_t n,
                         float scale, float shift) {
  for (int64_t i = 0; i < n; ++i) dst[i] = float(src[i]) * scale + shift;
}

}  // extern "C"
