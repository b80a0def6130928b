// Threaded reference-image loader: decode (PNG via libpng / JPEG via libjpeg)
// + PIL-convention antialiased bicubic resize + [-1,1] float32 CHW output.
//
// The reference loads its per-prompt reference images through PIL one at a
// time inside the epoch loop (train_sd3_fast_pickscore.py:773-799) — at
// production batch counts (48 prompt-groups x R refs per epoch) this is a
// host-side serial bottleneck. This loader decodes and resizes a whole batch
// across a std::thread pool. Resize matches PIL's BICUBIC semantics: a
// separable Catmull-Rom(a=-0.5) convolution whose support is scaled by the
// downsampling ratio (antialiasing), so values track PIL within ~1/255.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Rgb8 {
  std::vector<uint8_t> data;  // h * w * 3
  int w = 0, h = 0;
};

bool decode_png(const char* path, Rgb8* out) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;
  out->w = image.width;
  out->h = image.height;
  out->data.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const char* path, Rgb8* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_image(const char* path, Rgb8* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  size_t got = std::fread(magic, 1, 4, f);
  std::fclose(f);
  if (got < 4) return false;
  if (magic[0] == 0x89 && magic[1] == 'P') return decode_png(path, out);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path, out);
  return false;
}

inline double cubic_filter(double x) {  // Catmull-Rom, a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// PIL-style 1D resampling coefficients: support scaled by the downscale
// ratio (antialias), weights normalised per output pixel.
struct Coeffs {
  std::vector<int> start;            // per out pixel
  std::vector<int> count;
  std::vector<std::vector<double>> w;
};

Coeffs make_coeffs(int in_size, int out_size) {
  Coeffs c;
  const double scale = double(in_size) / out_size;
  const double filter_scale = std::max(scale, 1.0);
  const double support = 2.0 * filter_scale;
  c.start.resize(out_size);
  c.count.resize(out_size);
  c.w.resize(out_size);
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = std::max(int(center - support + 0.5), 0);
    int hi = std::min(int(center + support + 0.5), in_size);
    c.start[i] = lo;
    c.count[i] = hi - lo;
    c.w[i].resize(hi - lo);
    double total = 0.0;
    for (int j = lo; j < hi; ++j) {
      double wv = cubic_filter((j - center + 0.5) / filter_scale);
      c.w[i][j - lo] = wv;
      total += wv;
    }
    if (total != 0.0)
      for (auto& wv : c.w[i]) wv /= total;
  }
  return c;
}

// resize RGB8 (h,w) -> float32 CHW (3,res,res) in [-1,1]
void resize_to_chw(const Rgb8& img, int res, float* out) {
  const Coeffs cx = make_coeffs(img.w, res);
  const Coeffs cy = make_coeffs(img.h, res);
  // horizontal pass: (h, res, 3) doubles
  std::vector<double> tmp(size_t(img.h) * res * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
    for (int x = 0; x < res; ++x) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < cx.count[x]; ++k) {
        const uint8_t* px = row + size_t(cx.start[x] + k) * 3;
        const double wv = cx.w[x][k];
        acc[0] += wv * px[0];
        acc[1] += wv * px[1];
        acc[2] += wv * px[2];
      }
      double* o = &tmp[(size_t(y) * res + x) * 3];
      // PIL stores the horizontal pass as uint8 (clip8 per pass) — quantise
      // identically so large downscales track PIL, not just small ones
      for (int ch = 0; ch < 3; ++ch)
        o[ch] = std::min(std::max(std::round(acc[ch]), 0.0), 255.0);
    }
  }
  // vertical pass + normalise + CHW
  const size_t plane = size_t(res) * res;
  for (int y = 0; y < res; ++y) {
    for (int x = 0; x < res; ++x) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < cy.count[y]; ++k) {
        const double* px = &tmp[(size_t(cy.start[y] + k) * res + x) * 3];
        const double wv = cy.w[y][k];
        acc[0] += wv * px[0];
        acc[1] += wv * px[1];
        acc[2] += wv * px[2];
      }
      for (int ch = 0; ch < 3; ++ch) {
        // PIL clamps to u8 after each pass; single clamp here is within 1/255
        double v = std::min(std::max(acc[ch], 0.0), 255.0);
        out[ch * plane + size_t(y) * res + x] =
            float(v / 255.0 * 2.0 - 1.0);
      }
    }
  }
}

}  // namespace

extern "C" {

// paths: n C strings; out: n*3*res*res float32; ok: n bytes (1 = loaded).
// Failed images leave their slot untouched (caller fills fallbacks).
void load_images_chw(const char** paths, int64_t n, int64_t res, float* out,
                     uint8_t* ok, int64_t n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max<int64_t>(1, std::min(n_threads, n));
  const size_t stride = size_t(3) * res * res;
  auto worker = [&](int64_t tid) {
    for (int64_t i = tid; i < n; i += n_threads) {
      Rgb8 img;
      if (decode_image(paths[i], &img) && img.w > 0 && img.h > 0) {
        resize_to_chw(img, int(res), out + size_t(i) * stride);
        ok[i] = 1;
      } else {
        ok[i] = 0;
      }
    }
  };
  if (n_threads == 1) {
    worker(0);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
}

}  // extern "C"
