// Native data-loading core: threaded JPEG decode + bilinear resize + normalization.
//
// The hot host-side path of the input pipeline (the work torch DataLoader workers do in
// the reference, references/classification/train.py:137-146) as a small C++ library:
// a batch of encoded JPEG buffers comes in, a thread pool decodes each with libjpeg,
// bilinearly resizes to the target resolution and writes normalized float32 NHWC
// directly into the caller-provided batch buffer — zero Python-side per-image work.
//
// Exposed through a plain C ABI consumed via ctypes (holocron_tpu/utils/data/_native.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decodes a JPEG buffer to tightly-packed RGB8. Returns false on failure.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb, int& width,
                 int& height) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  width = static_cast<int>(cinfo.output_width);
  height = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(width) * height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize (half-pixel centers) + per-channel normalization into float32 HWC.
void resize_normalize(const uint8_t* src, int sh, int sw, float* dst, int dh, int dw,
                      const float* mean, const float* std) {
  const float inv255 = 1.0f / 255.0f;
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      float* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        float v = (top + wy * (bot - top)) * inv255;
        out[c] = (v - mean[c]) * inv_std[c];
      }
    }
  }
}

// Bilinear resize of a sub-window [top, left, ch, cw) of src to uint8 HWC output,
// with optional horizontal flip. Used by the training-recipe RandomResizedCrop path.
void crop_resize_u8(const uint8_t* src, int sh, int sw, int top, int left, int ch, int cw,
                    uint8_t* dst, int dh, int dw, bool flip) {
  const float sy = static_cast<float>(ch) / dh;
  const float sx = static_cast<float>(cw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = top + (y + 0.5f) * sy - 0.5f;
    fy = std::max(static_cast<float>(top),
                  std::min(fy, static_cast<float>(top + ch - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, top + ch - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = left + (x + 0.5f) * sx - 0.5f;
      fx = std::max(static_cast<float>(left),
                    std::min(fx, static_cast<float>(left + cw - 1)));
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, left + cw - 1);
      float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      int out_x = flip ? (dw - 1 - x) : x;
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + out_x) * 3;
      for (int c = 0; c < 3; ++c) {
        float t = p00[c] + wx * (p01[c] - p00[c]);
        float b = p10[c] + wx * (p11[c] - p10[c]);
        float v = t + wy * (b - t);
        out[c] = static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
      }
    }
  }
}

// xorshift64* PRNG: deterministic per-image randomness from a caller-provided seed.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545f4914f6cdd1dULL;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
  int randint(int lo, int hi) {  // inclusive bounds
    return lo + static_cast<int>(next() % static_cast<uint64_t>(hi - lo + 1));
  }
};

// RandomResizedCrop parameter sampling (torchvision semantics: 10 attempts,
// center-crop fallback at the closest in-range aspect ratio).
void sample_rrc(Rng& rng, int h, int w, double smin, double smax, double rmin, double rmax,
                int& top, int& left, int& ch, int& cw) {
  const double area = static_cast<double>(h) * w;
  const double log_rmin = std::log(rmin), log_rmax = std::log(rmax);
  for (int i = 0; i < 10; ++i) {
    double target_area = area * rng.uniform(smin, smax);
    double ar = std::exp(rng.uniform(log_rmin, log_rmax));
    int cw_ = static_cast<int>(std::lround(std::sqrt(target_area * ar)));
    int ch_ = static_cast<int>(std::lround(std::sqrt(target_area / ar)));
    if (cw_ > 0 && cw_ <= w && ch_ > 0 && ch_ <= h) {
      top = rng.randint(0, h - ch_);
      left = rng.randint(0, w - cw_);
      ch = ch_;
      cw = cw_;
      return;
    }
  }
  double in_ratio = static_cast<double>(w) / h;
  if (in_ratio < rmin) {
    cw = w;
    ch = static_cast<int>(std::lround(w / rmin));
  } else if (in_ratio > rmax) {
    ch = h;
    cw = static_cast<int>(std::lround(h * rmax));
  } else {
    cw = w;
    ch = h;
  }
  top = (h - ch) / 2;
  left = (w - cw) / 2;
}

}  // namespace

extern "C" {

// Training-recipe front half, fused natively: JPEG decode + RandomResizedCrop +
// random horizontal flip -> uint8 (out_h, out_w, 3). Per-image randomness comes from
// `seeds[i]` (deterministic given the seed). Returns per-image status (0 = ok).
// The remaining recipe stages (TrivialAugmentWide, normalize, RandomErasing) run on
// the already-small crop in Python/device code.
int hl_decode_rrc_one(const uint8_t* jpeg, size_t len, int out_h, int out_w,
                      double scale_min, double scale_max, double ratio_min,
                      double ratio_max, double flip_prob, uint64_t seed, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(jpeg, len, rgb, w, h)) return 1;
  Rng rng(seed);
  int top, left, ch, cw;
  sample_rrc(rng, h, w, scale_min, scale_max, ratio_min, ratio_max, top, left, ch, cw);
  bool flip = rng.uniform() < flip_prob;
  crop_resize_u8(rgb.data(), h, w, top, left, ch, cw, out, out_h, out_w, flip);
  return 0;
}

void hl_decode_rrc_batch(const uint8_t* blob, const size_t* offsets, int n, int out_h,
                         int out_w, double scale_min, double scale_max, double ratio_min,
                         double ratio_max, double flip_prob, const uint64_t* seeds,
                         uint8_t* out, int* status, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const size_t img_elems = static_cast<size_t>(out_h) * out_w * 3;
  std::vector<std::thread> pool;
  auto worker = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      status[i] = hl_decode_rrc_one(blob + offsets[i], offsets[i + 1] - offsets[i], out_h,
                                    out_w, scale_min, scale_max, ratio_min, ratio_max,
                                    flip_prob, seeds[i], out + img_elems * i);
    }
  };
  int threads = std::min(num_threads, n);
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker, t, threads);
  for (auto& th : pool) th.join();
}

// Decodes one JPEG into a normalized float32 (out_h, out_w, 3) buffer. Returns 0 on
// success, nonzero on decode failure.
int hl_decode_one(const uint8_t* jpeg, size_t len, int out_h, int out_w,
                  const float* mean, const float* std, float* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(jpeg, len, rgb, w, h)) return 1;
  resize_normalize(rgb.data(), h, w, out, out_h, out_w, mean, std);
  return 0;
}

// Decodes a batch: `offsets` holds n+1 byte offsets into `blob`; results land in
// `out` (n, out_h, out_w, 3) float32. `status[i]` is 0 on success. Threaded.
void hl_decode_batch(const uint8_t* blob, const size_t* offsets, int n, int out_h,
                     int out_w, const float* mean, const float* std, float* out,
                     int* status, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const size_t img_elems = static_cast<size_t>(out_h) * out_w * 3;
  std::vector<std::thread> pool;
  auto worker = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      status[i] = hl_decode_one(blob + offsets[i], offsets[i + 1] - offsets[i], out_h,
                                out_w, mean, std, out + img_elems * i);
    }
  };
  int threads = std::min(num_threads, n);
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker, t, threads);
  for (auto& th : pool) th.join();
}

// Serving hot path (v3): decodes one JPEG and bilinearly resizes the full frame to
// a (out_h, out_w, 3) uint8 buffer — NO normalization. Shipping uint8 to the device
// is 4x lighter on the host->device link than normalized float32 (measured ~6 ms
// p50 through the TPU tunnel at 224px, docs/PERF.md); the /255 + mean/std fold into
// the model's single jitted program (api/app/vision.py).
int hl_decode_u8_one(const uint8_t* jpeg, size_t len, int out_h, int out_w,
                     uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(jpeg, len, rgb, w, h)) return 1;
  crop_resize_u8(rgb.data(), h, w, 0, 0, h, w, out, out_h, out_w, false);
  return 0;
}

void hl_decode_u8_batch(const uint8_t* blob, const size_t* offsets, int n, int out_h,
                        int out_w, uint8_t* out, int* status, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const size_t img_elems = static_cast<size_t>(out_h) * out_w * 3;
  std::vector<std::thread> pool;
  auto worker = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      status[i] = hl_decode_u8_one(blob + offsets[i], offsets[i + 1] - offsets[i],
                                   out_h, out_w, out + img_elems * i);
    }
  };
  int threads = std::min(num_threads, n);
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker, t, threads);
  for (auto& th : pool) th.join();
}

int hl_version() { return 3; }

}  // extern "C"
