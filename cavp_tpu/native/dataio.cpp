// Native host-IO core for the data pipeline.
//
// The TPU-native framework's answer to the reference's
// torch-DataLoader-worker decode path (dataset/*: PIL decode + resize in
// 16 worker processes): JPEG/PNG decode via libjpeg/libpng, PIL-parity
// antialiased bicubic (images) / nearest (masks) resize, ImageNet
// normalization, and a std::thread batch API — all in one shared
// library consumed through ctypes (no pybind11 dependency).
//
// Exposed C ABI:
//   decode_image_file(path, H, W, mean[3], std[3], out[H*W*3])  -> 0/err
//   decode_mask_file(path, H, W, out[H*W] int32, nearest)        -> 0/err
//   decode_image_batch(paths, n, H, W, mean, std, out, n_threads)-> 0/err
//   decode_mask_batch(paths, n, H, W, out, n_threads)            -> 0/err

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct ImageU8 {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, ImageU8* out, bool as_gray) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (as_gray) {
    // keep palette/gray indices raw: palette index IS the class label
    if (color_type == PNG_COLOR_TYPE_RGB ||
        color_type == PNG_COLOR_TYPE_RGB_ALPHA) {
      png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    }
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    // 1/2/4-bit gray or palette (e.g. PIL mode '1' binary masks):
    // unpack to one byte per pixel WITHOUT value scaling, so a 1-bit
    // mask reads as {0,1} — matching np.asarray(PIL '1') semantics.
    if (bit_depth < 8) png_set_packing(png);
  } else {
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  out->h = h;
  out->w = w;
  out->c = channels;
  out->data.resize(size_t(h) * w * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + size_t(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, ImageU8* out, bool as_gray) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
    if (ok && as_gray) {
      // luminance-convert decoded RGB
      for (size_t i = 0; i < size_t(out->h) * out->w; i++) {
        const uint8_t* p = &out->data[i * 3];
        out->data[i] = uint8_t((p[0] * 299 + p[1] * 587 + p[2] * 114) / 1000);
      }
      out->data.resize(size_t(out->h) * out->w);
      out->c = 1;
    }
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out, as_gray);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// PIL-parity antialiased bicubic resize (Keys a=-0.5, support widened by
// the scale factor when reducing, like Pillow's convolution resampler).
// ---------------------------------------------------------------------------

inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterTable {
  int ksize;
  std::vector<int> bounds;      // [out] start index
  std::vector<int> counts;      // [out] taps
  std::vector<float> weights;   // [out, ksize]
};

FilterTable build_filter(int in_size, int out_size) {
  constexpr double support0 = 2.0;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support0 * filterscale;
  int ksize = int(std::ceil(support)) * 2 + 1;
  FilterTable t;
  t.ksize = ksize;
  t.bounds.resize(out_size);
  t.counts.resize(out_size);
  t.weights.assign(size_t(out_size) * ksize, 0.0f);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    t.bounds[xx] = xmin;
    t.counts[xx] = xmax - xmin;
    float* w = &t.weights[size_t(xx) * ksize];
    double total = 0.0;
    for (int x = xmin; x < xmax; x++) {
      double ww = cubic((x + 0.5 - center) / filterscale);
      w[x - xmin] = float(ww);
      total += ww;
    }
    if (total != 0.0)
      for (int i = 0; i < xmax - xmin; i++) w[i] = float(w[i] / total);
  }
  return t;
}

void resize_bicubic(const ImageU8& src, int H, int W,
                    std::vector<float>* dst) {
  int c = src.c;
  FilterTable fx = build_filter(src.w, W);
  FilterTable fy = build_filter(src.h, H);
  // horizontal pass: [src.h, W, c], float accumulation, tap-bounded
  std::vector<float> tmp(size_t(src.h) * W * c);
  for (int y = 0; y < src.h; y++) {
    const uint8_t* srow = &src.data[size_t(y) * src.w * c];
    float* trow = &tmp[size_t(y) * W * c];
    for (int x = 0; x < W; x++) {
      const float* w = &fx.weights[size_t(x) * fx.ksize];
      int x0 = fx.bounds[x];
      int n = fx.counts[x];
      for (int ch = 0; ch < c; ch++) {
        float acc = 0.0f;
        const uint8_t* sp = srow + size_t(x0) * c + ch;
        for (int k = 0; k < n; k++) acc += w[k] * sp[size_t(k) * c];
        trow[size_t(x) * c + ch] = acc;
      }
    }
  }
  dst->resize(size_t(H) * W * c);
  for (int y = 0; y < H; y++) {
    const float* w = &fy.weights[size_t(y) * fy.ksize];
    int y0 = fy.bounds[y];
    int n = fy.counts[y];
    float* drow = &(*dst)[size_t(y) * W * c];
    for (int x = 0; x < W * c; x++) {
      float acc = 0.0f;
      for (int k = 0; k < n; k++)
        acc += w[k] * tmp[size_t(y0 + k) * W * c + x];
      drow[x] = acc;
    }
  }
}

void resize_nearest_mask(const ImageU8& src, int H, int W, int32_t* out) {
  // PIL NEAREST rule (center sampling): src = int((dst + 0.5) * scale)
  for (int y = 0; y < H; y++) {
    int yi = int((y + 0.5) * double(src.h) / H);
    if (yi >= src.h) yi = src.h - 1;
    for (int x = 0; x < W; x++) {
      int xi = int((x + 0.5) * double(src.w) / W);
      if (xi >= src.w) xi = src.w - 1;
      out[size_t(y) * W + x] = src.data[(size_t(yi) * src.w + xi) * src.c];
    }
  }
}

int decode_image_impl(const char* path, int H, int W, const float* mean,
                      const float* stdv, float* out) {
  ImageU8 img;
  if (!decode_file(path, &img, /*as_gray=*/false)) return 1;
  std::vector<float> resized;
  resize_bicubic(img, H, W, &resized);
  for (size_t i = 0; i < size_t(H) * W; i++) {
    for (int ch = 0; ch < 3; ch++) {
      // PIL materializes the resized image as uint8 (round-to-nearest,
      // clamped) before ToTensor divides by 255; match both steps
      float v = roundf(resized[i * 3 + ch]);
      v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
      out[i * 3 + ch] = (v / 255.0f - mean[ch]) / stdv[ch];
    }
  }
  return 0;
}

int decode_mask_impl(const char* path, int H, int W, int32_t* out) {
  ImageU8 img;
  if (!decode_file(path, &img, /*as_gray=*/true)) return 1;
  resize_nearest_mask(img, H, W, out);
  return 0;
}

}  // namespace

extern "C" {

// Raw decode for the TRAIN path: random augmentation stays in Python
// (PIL-wrapped), the JPEG/PNG decode runs here with the GIL released.
// Writes source dims to *h/*w/*c always; returns 0 on success, 1 on
// decode failure, 2 when `cap` is too small for h*w*c bytes (caller
// reallocates and retries).
int decode_raw(const char* path, int as_gray, uint8_t* out, long cap,
               int* h, int* w, int* c) {
  ImageU8 img;
  if (!decode_file(path, &img, as_gray != 0)) return 1;
  *h = img.h;
  *w = img.w;
  *c = img.c;
  long need = long(img.h) * img.w * img.c;
  if (out == nullptr || cap < need) return 2;
  std::memcpy(out, img.data.data(), size_t(need));
  return 0;
}

int decode_image_file(const char* path, int H, int W, const float* mean,
                      const float* stdv, float* out) {
  return decode_image_impl(path, H, W, mean, stdv, out);
}

int decode_mask_file(const char* path, int H, int W, int32_t* out) {
  return decode_mask_impl(path, H, W, out);
}

int decode_image_batch(const char** paths, int n, int H, int W,
                       const float* mean, const float* stdv, float* out,
                       int n_threads) {
  std::vector<int> errs(n, 0);
  std::vector<std::thread> threads;
  int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      for (int i = t * per; i < std::min(n, (t + 1) * per); i++) {
        errs[i] = decode_image_impl(paths[i], H, W, mean, stdv,
                                    out + size_t(i) * H * W * 3);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int e : errs)
    if (e) return e;
  return 0;
}

int decode_mask_batch(const char** paths, int n, int H, int W, int32_t* out,
                      int n_threads) {
  std::vector<int> errs(n, 0);
  std::vector<std::thread> threads;
  int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      for (int i = t * per; i < std::min(n, (t + 1) * per); i++) {
        errs[i] = decode_mask_impl(paths[i], H, W, out + size_t(i) * H * W);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int e : errs)
    if (e) return e;
  return 0;
}

}  // extern "C"
