// Host-side native helpers for reward scoring.
//
// The reference depends on the `Levenshtein` pip package for the OCR reward
// (adv_grpo/ocr.py:47-62) and on PIL/numpy for uint8 image munging. Here the
// hot host-side loops are C++ behind a C ABI loaded via ctypes
// (adv_grpo_tpu/native/lib.py); pure-Python fallbacks keep the package
// importable without the compiled library.
//
// Build: adv_grpo_tpu/native/build.sh (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Classic O(mn) Levenshtein distance over bytes (UTF-8 strings are compared
// bytewise, matching python-Levenshtein for ASCII OCR targets).
int64_t levenshtein(const char* a, int64_t la, const char* b, int64_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= lb; ++j) {
      int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// float [-1,1] CHW -> uint8 HWC (the tensor_to_pil conversion,
// reference train_sd3_fast_pickscore.py:133-148) for a batch of images.
void chw_float_to_hwc_u8(const float* in, uint8_t* out, int64_t n, int64_t c,
                         int64_t h, int64_t w) {
  const int64_t plane = h * w;
  for (int64_t i = 0; i < n; ++i) {
    const float* img = in + i * c * plane;
    uint8_t* dst = out + i * plane * c;
    for (int64_t p = 0; p < plane; ++p) {
      for (int64_t ch = 0; ch < c; ++ch) {
        float v = img[ch * plane + p] * 0.5f + 0.5f;
        v = std::min(1.0f, std::max(0.0f, v));
        dst[p * c + ch] = static_cast<uint8_t>(v * 255.0f);
      }
    }
  }
}

}  // extern "C"
