// Native data loader: parallel PNG decode + bicubic antialias resize.
//
// The reference's ingest path is torchvision read_image + TF.resize per item
// on the Python main thread (ref src/datasets/ground_truth.py:72-83,
// div2k.py:26-31).  This C++ loader decodes PNGs with libpng and resizes
// with the same separable bicubic-antialias weights as sei_tpu/ops/bicubic.py
// (Pillow-style, cubic a=-0.5, torch antialias semantics), across a
// std::thread pool, producing float32 CHW in [0,1].  Exposed extern "C" for
// ctypes (sei_tpu/data/native.py).
//
// Build: see csrc/Makefile (g++ -O3 -shared -fPIC, links libpng/libz).

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<float> data;  // CHW
};

// ---------------------------------------------------------------------------
// PNG decode (libpng), normalized to float32 CHW with 3 channels
// (alpha dropped, grayscale replicated - ref src/datasets/fmd.py:10-19).
// ---------------------------------------------------------------------------
bool decode_png(const char* path, Image* out, std::string* err) {
  FILE* fp = fopen(path, "rb");
  if (!fp) {
    *err = std::string("cannot open ") + path;
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    *err = std::string("libpng failure on ") + path;
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  std::vector<uint8_t> row(w * channels);
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->c = 3;
  out->data.assign(3ull * h * w, 0.0f);
  const float inv = 1.0f / 255.0f;
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    for (png_uint_32 x = 0; x < w; ++x) {
      float r, g, b;
      const uint8_t* p = &row[x * channels];
      if (channels == 1) {
        r = g = b = p[0] * inv;
      } else if (channels == 2) {  // gray + alpha
        r = g = b = p[0] * inv;
      } else {
        r = p[0] * inv;
        g = p[1] * inv;
        b = p[2] * inv;  // alpha (if any) dropped
      }
      size_t idx = static_cast<size_t>(y) * w + x;
      out->data[idx] = r;
      out->data[1ull * h * w + idx] = g;
      out->data[2ull * h * w + idx] = b;
    }
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// ---------------------------------------------------------------------------
// Separable bicubic-antialias resize, identical math to ops/bicubic.py.
// ---------------------------------------------------------------------------
double cubic_aa(double x) {  // Pillow constant a = -0.5
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Taps {
  std::vector<int> xmin;          // first tap per output index
  std::vector<int> count;         // taps per output index
  std::vector<double> weights;    // flattened [out][max_taps]
  int max_taps = 0;
};

Taps aa_taps(int in_size, int out_size) {
  double scale = static_cast<double>(in_size) / out_size;
  double support = scale >= 1.0 ? 2.0 * scale : 2.0;
  double invscale = scale >= 1.0 ? 1.0 / scale : 1.0;
  Taps t;
  t.xmin.resize(out_size);
  t.count.resize(out_size);
  std::vector<std::vector<double>> rows(out_size);
  for (int i = 0; i < out_size; ++i) {
    double center = scale * (i + 0.5);
    int xmin = std::max(0, static_cast<int>(center - support + 0.5));
    int xmax = std::min(in_size, static_cast<int>(center + support + 0.5));
    double total = 0.0;
    std::vector<double> w;
    for (int j = xmin; j < xmax; ++j) {
      double v = cubic_aa((j - center + 0.5) * invscale);
      w.push_back(v);
      total += v;
    }
    for (auto& v : w) v /= (total == 0.0 ? 1.0 : total);
    t.xmin[i] = xmin;
    t.count[i] = static_cast<int>(w.size());
    t.max_taps = std::max(t.max_taps, t.count[i]);
    rows[i] = std::move(w);
  }
  t.weights.assign(static_cast<size_t>(out_size) * t.max_taps, 0.0);
  for (int i = 0; i < out_size; ++i)
    std::copy(rows[i].begin(), rows[i].end(),
              t.weights.begin() + static_cast<size_t>(i) * t.max_taps);
  return t;
}

void resize_plane(const float* src, int in_h, int in_w, float* dst, int out_h,
                  int out_w) {
  Taps th = aa_taps(in_h, out_h);
  Taps tw = aa_taps(in_w, out_w);
  // horizontal pass into temp (in_h x out_w)
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w);
  for (int y = 0; y < in_h; ++y) {
    const float* row = src + static_cast<size_t>(y) * in_w;
    for (int x = 0; x < out_w; ++x) {
      const double* w = &tw.weights[static_cast<size_t>(x) * tw.max_taps];
      double acc = 0.0;
      int x0 = tw.xmin[x];
      for (int k = 0; k < tw.count[x]; ++k) acc += w[k] * row[x0 + k];
      tmp[static_cast<size_t>(y) * out_w + x] = static_cast<float>(acc);
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; ++y) {
    const double* w = &th.weights[static_cast<size_t>(y) * th.max_taps];
    int y0 = th.xmin[y];
    for (int x = 0; x < out_w; ++x) {
      double acc = 0.0;
      for (int k = 0; k < th.count[y]; ++k)
        acc += w[k] * tmp[static_cast<size_t>(y0 + k) * out_w + x];
      dst[static_cast<size_t>(y) * out_w + x] = static_cast<float>(acc);
    }
  }
}

void shorter_side_dims(int h, int w, int size, int* out_h, int* out_w) {
  // torchvision semantics (ops/bicubic.py shorter_side_sizes)
  if (h <= w) {
    *out_h = size;
    *out_w = static_cast<int>(static_cast<int64_t>(size) * w / h);
  } else {
    *out_w = size;
    *out_h = static_cast<int>(static_cast<int64_t>(size) * h / w);
  }
}

}  // namespace

extern "C" {

// Probe one file: returns 0 on success and fills (h, w) of the RESIZED image
// (size <= 0 means no resize).
int sei_png_dims(const char* path, int size, int* out_h, int* out_w) {
  Image im;
  std::string err;
  if (!decode_png(path, &im, &err)) return 1;
  if (size > 0) {
    shorter_side_dims(im.h, im.w, size, out_h, out_w);
  } else {
    *out_h = im.h;
    *out_w = im.w;
  }
  return 0;
}

// Load one PNG into a caller-allocated float32 CHW buffer of (3, out_h,
// out_w) where (out_h, out_w) came from sei_png_dims.  Returns 0 on success.
int sei_load_png(const char* path, int size, float* out, int out_h, int out_w) {
  Image im;
  std::string err;
  if (!decode_png(path, &im, &err)) return 1;
  if (size <= 0 || (im.h == out_h && im.w == out_w)) {
    if (im.h != out_h || im.w != out_w) return 2;
    std::memcpy(out, im.data.data(), im.data.size() * sizeof(float));
    return 0;
  }
  for (int c = 0; c < 3; ++c) {
    resize_plane(im.data.data() + static_cast<size_t>(c) * im.h * im.w, im.h,
                 im.w, out + static_cast<size_t>(c) * out_h * out_w, out_h,
                 out_w);
  }
  return 0;
}

// Batch load with a thread pool: paths are NUL-separated; per-image output
// offsets (in floats) into one big caller buffer; dims arrays give each
// image's resized (h, w).  Returns the number of failures.
int sei_load_batch(const char* paths, const int64_t* offsets, const int* hs,
                   const int* ws, int n, int size, float* out, int n_threads) {
  std::vector<const char*> ps(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ps[i] = p;
    p += std::strlen(p) + 1;
  }
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (sei_load_png(ps[i], size, out + offsets[i], hs[i], ws[i]) != 0)
        failures.fetch_add(1);
    }
  };
  int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
