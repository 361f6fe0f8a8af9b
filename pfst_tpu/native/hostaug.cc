// Native host-side augmentation kernels (data-loader hot path).
//
// The photometric distortion chain (PhotoMetricDistortion /
// StrongAugmentation, reference rsiseg/datasets/pipelines/
// transforms.py:943-1160) spends most of its time in the
// saturation/hue steps: cv2 BGR->HSV, a per-channel LUT, HSV->BGR —
// two full-image color conversions plus an intermediate HSV buffer
// per step.  This kernel fuses the whole round-trip into ONE pass per
// pixel with no intermediate image, replicating OpenCV's uint8 HSV
// arithmetic bit-exactly:
//
//  * BGR->HSV (8u): fixed-point with the sdiv/hdiv tables and
//    hsv_shift=12 rounding (opencv color_hsv RGB2HSV_b).
//  * HSV->BGR (8u): float sector formula with the exact rounding this
//    machine's cv2 build exhibits (verified exhaustively): the
//    1 - s*(1-h) / 1 - s*h terms are FMA-contracted (fmaf), the final
//    x*255 is TRUNCATED to int, not rounded.  Build uses
//    -ffp-contract=off + explicit fmaf so our own compile cannot
//    re-associate differently.
//
// Parity is enforced by exhaustive tests over the full 2^24 BGR cube
// and the full (180, 256, 256) HSV cube (tests/test_native_hostaug.py).
// Caveat: cv2's HSV->BGR scalar tail ROUNDS while its 32-px SIMD loop
// truncates, so cv2 disagrees with itself by +/-1 on rows whose width
// is not a multiple of 32; this kernel uniformly implements the SIMD
// behaviour (exact for all shipped crop sizes).
//
// Built at import time by pfst_tpu/native/hostaug.py (g++ -O3); the
// cv2+numpy fallback stays the behavioural reference.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kHsvShift = 12;

struct Tables {
  int sdiv[256];
  int hdiv[256];
  Tables() {
    sdiv[0] = hdiv[0] = 0;
    for (int i = 1; i < 256; ++i) {
      sdiv[i] = static_cast<int>((255 << kHsvShift) / (1.0 * i) + 0.5);
      hdiv[i] = static_cast<int>((180 << kHsvShift) / (6.0 * i) + 0.5);
    }
  }
};
const Tables kTab;

inline void bgr2hsv_px(int b, int g, int r, uint8_t* h8, uint8_t* s8,
                       uint8_t* v8) {
  int v = b > g ? b : g;
  if (r > v) v = r;
  int vmin = b < g ? b : g;
  if (r < vmin) vmin = r;
  int diff = v - vmin;
  int vr = v == r ? -1 : 0;
  int vg = v == g ? -1 : 0;
  int s = (diff * kTab.sdiv[v] + (1 << (kHsvShift - 1))) >> kHsvShift;
  int h = (vr & (g - b)) +
          (~vr & ((vg & (b - r + 2 * diff)) +
                  ((~vg) & (r - g + 4 * diff))));
  h = (h * kTab.hdiv[diff] + (1 << (kHsvShift - 1))) >> kHsvShift;
  h += h < 0 ? 180 : 0;
  *h8 = static_cast<uint8_t>(h);
  *s8 = static_cast<uint8_t>(s);
  *v8 = static_cast<uint8_t>(v);
}

inline uint8_t trunc_u8(float x) {
  // cv2 (5.0) truncates the final x*255 toward zero, then clamps.
  int i = static_cast<int>(x);
  return static_cast<uint8_t>(i < 0 ? 0 : (i > 255 ? 255 : i));
}

inline void hsv2bgr_px(uint8_t h8, uint8_t s8, uint8_t v8, uint8_t* b8,
                       uint8_t* g8, uint8_t* r8) {
  if (s8 == 0) {
    *b8 = *g8 = *r8 = v8;
    return;
  }
  float s = s8 * (1.f / 255.f);
  float v = v8 * (1.f / 255.f);
  float b, g, r;
  {
    // Empirically derived from this cv2 build (verified exhaustively
    // by tests/test_native_hostaug.py); note rows 3-5 differ from the
    // classic OpenCV table.
    static const int sector_data[6][3] = {{1, 3, 0}, {1, 0, 2},
                                          {3, 0, 1}, {0, 2, 1},
                                          {0, 1, 3}, {2, 1, 0}};
    float h = h8 * (6.f / 180.f);
    if (h < 0.f) {
      do h += 6.f; while (h < 0.f);
    } else if (h >= 6.f) {
      do h -= 6.f; while (h >= 6.f);
    }
    int sector = static_cast<int>(std::floor(h));
    h -= sector;
    if (static_cast<unsigned>(sector) >= 6u) {
      sector = 0;
      h = 0.f;
    }
    float tab[4];
    tab[0] = v;
    tab[1] = v * (1.f - s);
    tab[2] = v * std::fmaf(-s, h, 1.f);
    tab[3] = v * std::fmaf(-s, 1.f - h, 1.f);
    b = tab[sector_data[sector][0]];
    g = tab[sector_data[sector][1]];
    r = tab[sector_data[sector][2]];
  }
  *b8 = trunc_u8(b * 255.f);
  *g8 = trunc_u8(g * 255.f);
  *r8 = trunc_u8(r * 255.f);
}

}  // namespace

extern "C" {

// Fused BGR -> HSV -> {S-LUT, H-LUT} -> BGR, one pass, no
// intermediate image.  Either LUT may be null (identity).  src/dst
// are HxWx3 uint8 BGR; may alias.
void hsv_modify_u8(const uint8_t* src, uint8_t* dst, int64_t npix,
                   const uint8_t* sat_lut, const uint8_t* hue_lut) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = src + 3 * i;
    uint8_t h, s, v;
    bgr2hsv_px(p[0], p[1], p[2], &h, &s, &v);
    if (sat_lut) s = sat_lut[s];
    if (hue_lut) h = hue_lut[h];
    hsv2bgr_px(h, s, v, dst + 3 * i, dst + 3 * i + 1,
               dst + 3 * i + 2);
  }
}

// Bare conversions, exposed for the exhaustive parity tests.
void bgr2hsv_u8(const uint8_t* src, uint8_t* dst, int64_t npix) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = src + 3 * i;
    bgr2hsv_px(p[0], p[1], p[2], dst + 3 * i, dst + 3 * i + 1,
               dst + 3 * i + 2);
  }
}

void hsv2bgr_u8(const uint8_t* src, uint8_t* dst, int64_t npix) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = src + 3 * i;
    hsv2bgr_px(p[0], p[1], p[2], dst + 3 * i, dst + 3 * i + 1,
               dst + 3 * i + 2);
  }
}

// LUT gather: dst[i] = lut[src[i]] (any-layout uint8).
void apply_lut_u8(const uint8_t* src, uint8_t* dst, int64_t n,
                  const uint8_t* lut) {
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

}  // extern "C"
