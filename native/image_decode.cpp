// Native PNG decode for the data layer (compiled into libmatching_parser.so
// alongside the matching parser; see build.sh).
//
// The reference decodes images one at a time through cv2/imageio
// (Phase2/train.py:38-46 loadDataset; Phase1/Wrapper.py:31-44 load_images).
// A nerf_synthetic training split is 100 x 800x800 PNGs — decode is
// embarrassingly parallel across files, so this does one libpng decode per
// thread (capped at hardware concurrency) into a caller-provided
// (n, h, w, 3) uint8 buffer.  Python binds via ctypes
// (sfm_nerf_tpu/io/blender.py), falling back to imageio when the native
// library or libpng is unavailable.
//
// Output is 8-bit RGB: palette/gray expanded, 16-bit stripped, alpha
// DROPPED (not blended) — matching the reference's `img[..., :3]`.

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode one PNG file.  If out == nullptr only the header is read.
// Returns 0 on success, negative on failure.  h/w always written on
// success; when decoding, the file's dims must equal *h/*w.
int decode_one(const char* path, uint8_t* out, int64_t* h, int64_t* w,
               bool header_only) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_byte sig[8];
  if (std::fread(sig, 1, 8, fp) != 8 || png_sig_cmp(sig, 0, 8)) {
    std::fclose(fp);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {  // libpng error trampoline
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  if (header_only) {
    *h = height;
    *w = width;
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
  }
  if ((int64_t)height != *h || (int64_t)width != *w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -5;
  }

  // normalize every input layout to 8-bit RGB
  png_byte color = png_get_color_type(png, info);
  if (png_get_bit_depth(png, info) == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_bit_depth(png, info) < 8) png_set_expand(png);
  png_set_strip_alpha(png);  // reference drops alpha (train.py:44)
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != width * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -6;
  }

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out + (int64_t)y * width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

}  // namespace

extern "C" {

// Header-only dimension probe.  Returns 0 / negative error.
int64_t png_dims(const char* path, int64_t* h, int64_t* w) {
  return decode_one(path, nullptr, h, w, /*header_only=*/true);
}

// Parallel batch decode: ``paths`` is n NUL-terminated strings
// back-to-back; every image must be (h, w); output buffer is
// (n, h, w, 3) uint8 RGB.  Returns 0, or -(index+1) of the first file
// that failed.
int64_t decode_png_batch(const char* paths, int64_t n, uint8_t* out,
                         int64_t h, int64_t w) {
  std::vector<const char*> files(n);
  const char* p = paths;
  for (int64_t i = 0; i < n; ++i) {
    files[i] = p;
    p += std::strlen(p) + 1;
  }
  std::atomic<int64_t> next(0), failed(0);
  auto work = [&] {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n || failed.load()) break;
      int64_t hh = h, ww = w;
      if (decode_one(files[i], out + i * h * w * 3, &hh, &ww, false) != 0) {
        int64_t expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
      }
    }
  };
  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 4;
  if ((int64_t)n_threads > n) n_threads = (unsigned)n;
  std::vector<std::thread> threads;
  for (unsigned t = 0; t + 1 < n_threads; ++t) threads.emplace_back(work);
  work();
  for (auto& t : threads) t.join();
  return -failed.load();
}

}  // extern "C"
