// Native data-loading runtime: threaded JPEG/PNG decode + preprocess.
//
// The TPU-native equivalent of the reference's torch DataLoader worker pool
// (SURVEY.md §3.1 "DataLoader workers (separate processes)"): decode,
// BGR conversion, caffe mean subtraction, shortest-side bilinear resize and
// static padding run in C++ threads with the GIL released, feeding numpy
// batch buffers directly. Semantics mirror
// lib/roi_data_layer/minibatch.py:19-87 + lib/model/utils/blob.py:20-52:
//   * imread -> BGR (grayscale expanded to 3 channels)
//   * float32 mean subtraction (BGR means)
//   * resize shortest side to target_size, cv2.INTER_LINEAR convention
//     (half-pixel centers), no MAX_SIZE clamp
//   * optional horizontal flip BEFORE preprocessing (flipped roidb entries)
//   * zero-padded into the caller's (pad_h, pad_w) static bucket.
//
// C API (ctypes): i2v_load_batch().

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int h = 0, w = 0;            // decoded size
  std::vector<uint8_t> bgr;    // h*w*3, BGR
  bool ok = false;
};

// ---------------------------------------------------------------- JPEG ----

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

Image decode_jpeg(FILE* f) {
  Image im;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return im;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;   // grayscale auto-expands
  jpeg_start_decompress(&cinfo);
  im.h = cinfo.output_height;
  im.w = cinfo.output_width;
  im.bgr.resize(size_t(im.h) * im.w * 3);
  std::vector<uint8_t> row(size_t(im.w) * 3);
  uint8_t* rp = row.data();
  for (int y = 0; y < im.h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = im.bgr.data() + size_t(y) * im.w * 3;
    for (int x = 0; x < im.w; ++x) {       // RGB -> BGR
      dst[x * 3 + 0] = row[x * 3 + 2];
      dst[x * 3 + 1] = row[x * 3 + 1];
      dst[x * 3 + 2] = row[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  im.ok = true;
  return im;
}

// ----------------------------------------------------------------- PNG ----

Image decode_png(FILE* f) {
  Image im;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return im;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return im;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return im;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_set_bgr(png);                       // decode straight to BGR
  png_read_update_info(png, info);
  im.h = png_get_image_height(png, info);
  im.w = png_get_image_width(png, info);
  im.bgr.resize(size_t(im.h) * im.w * 3);
  std::vector<png_bytep> rows(im.h);
  for (int y = 0; y < im.h; ++y)
    rows[y] = im.bgr.data() + size_t(y) * im.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  im.ok = true;
  return im;
}

Image decode_file(const char* path) {
  Image im;
  FILE* f = std::fopen(path, "rb");
  if (!f) return im;
  uint8_t magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    im = decode_jpeg(f);
  } else if (got >= 8 && magic[0] == 0x89 && magic[1] == 'P') {
    im = decode_png(f);
  }
  std::fclose(f);
  return im;
}

// ---------------------------------------------------- resize + pack -------

// One image: flip -> mean-subtract -> bilinear resize (cv2 half-pixel
// convention on the float image) -> write into the padded batch slot.
void preprocess_one(const Image& im, bool flip, const float* means,
                    int target_size, int pad_h, int pad_w,
                    float* out /* pad_h*pad_w*3 */, float* out_scale,
                    int32_t* out_hw) {
  const int h = im.h, w = im.w;
  const float scale = float(target_size) / float(std::min(h, w));
  int rh = int(std::lround(h * scale));
  int rw = int(std::lround(w * scale));
  rh = std::min(rh, pad_h);
  rw = std::min(rw, pad_w);
  *out_scale = scale;
  out_hw[0] = rh;
  out_hw[1] = rw;

  const float sy = float(h) / float(rh);
  const float sx = float(w) / float(rw);
  std::vector<int> x0s(rw), x1s(rw);
  std::vector<float> fxs(rw);
  for (int x = 0; x < rw; ++x) {
    float src = (x + 0.5f) * sx - 0.5f;
    src = std::max(0.0f, std::min(src, float(w - 1)));
    int x0 = int(src);
    x0s[x] = std::min(x0, w - 1);
    x1s[x] = std::min(x0 + 1, w - 1);
    fxs[x] = src - float(x0);
  }
  for (int y = 0; y < rh; ++y) {
    float srcy = (y + 0.5f) * sy - 0.5f;
    srcy = std::max(0.0f, std::min(srcy, float(h - 1)));
    int y0 = std::min(int(srcy), h - 1);
    int y1 = std::min(y0 + 1, h - 1);
    float fy = srcy - float(y0);
    const uint8_t* r0 = im.bgr.data() + size_t(y0) * w * 3;
    const uint8_t* r1 = im.bgr.data() + size_t(y1) * w * 3;
    float* dst = out + (size_t(y) * pad_w) * 3;
    for (int x = 0; x < rw; ++x) {
      int sx0 = x0s[x], sx1 = x1s[x];
      if (flip) {                 // flip source column lookup
        sx0 = w - 1 - sx0;
        sx1 = w - 1 - sx1;
      }
      const float fx = fxs[x];
      for (int c = 0; c < 3; ++c) {
        const float v00 = r0[sx0 * 3 + c], v01 = r0[sx1 * 3 + c];
        const float v10 = r1[sx0 * 3 + c], v11 = r1[sx1 * 3 + c];
        const float top = v00 + (v01 - v00) * fx;
        const float bot = v10 + (v11 - v10) * fx;
        dst[x * 3 + c] = top + (bot - top) * fy - means[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode+preprocess a batch of image files in parallel.
// out_images must be zero-initialized by the caller (padding stays 0).
// Returns the number of images that failed to decode (0 = success).
int i2v_load_batch(const char** paths, const uint8_t* flips, int n,
                   const float* pixel_means, int target_size,
                   int pad_h, int pad_w,
                   float* out_images, float* out_scales, int32_t* out_hw,
                   int n_threads) {
  std::atomic<int> next(0), failed(0);
  const int workers = std::max(1, std::min(n_threads, n));
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      Image im = decode_file(paths[i]);
      if (!im.ok || im.h < 2 || im.w < 2) {
        failed.fetch_add(1);
        out_scales[i] = 0.0f;
        out_hw[i * 2] = 0;
        out_hw[i * 2 + 1] = 0;
        continue;
      }
      preprocess_one(im, flips[i] != 0, pixel_means, target_size,
                     pad_h, pad_w,
                     out_images + size_t(i) * pad_h * pad_w * 3,
                     out_scales + i, out_hw + i * 2);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < workers; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return failed.load();
}

// Pack f32 NHWC images into conv1 parity planes (the host-planes serving
// input contract): out[b][py][px][c][i][j] = bf16(in[b][2i+py-3][2j+px-3][c])
// with zeros outside the image (the implicit pad-3 of the 7x7 s2 conv).
// Layout mirrors ops/pallas/conv1_kernel.pack_conv1_planes_np BIT-FOR-BIT:
// f32->bf16 uses round-to-nearest-even. The caller zero-initializes `out`
// ((b, 2, 2, 3, hq, wq) uint16) so only in-image elements are written.
static inline uint16_t f32_to_bf16_rne(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  x += 0x7fffu + ((x >> 16) & 1u);   // RNE (pixel data: no NaN concern)
  return (uint16_t)(x >> 16);
}

int i2v_pack_planes(const float* in, int b, int h, int w,
                    int hq, int wq, uint16_t* out, int n_threads) {
  std::atomic<int> next(0);
  // one task = one image; each input row is read ONCE and scattered to its
  // 6 destination plane rows (py is fixed by the row parity; 2 px x 3 c),
  // all walked contiguously — 1x read amplification vs 6x for the
  // per-plane gather formulation (measured 8.3 -> ~2 ms/frame, one core)
  const int workers = std::max(1, std::min(n_threads, b));
  auto work = [&]() {
    // phase 1 per row: bulk f32->bf16 into an L1-resident temp — a
    // branch-free contiguous loop the compiler vectorizes (the scalar
    // per-pixel convert was the bottleneck: ~6 cycles/element). phase 2:
    // scatter bf16s from L1 (6 contiguous dst walks, stride-6 L1 reads).
    std::vector<uint16_t> tmp(size_t(w) * 3);
    for (;;) {
      const int bi = next.fetch_add(1);
      if (bi >= b) return;
      const float* src = in + size_t(bi) * h * w * 3;
      uint16_t* obase = out + size_t(bi) * 12 * hq * wq;
      for (int r = 0; r < h; ++r) {
        const int i = (r + 3) >> 1, py = (r + 3) & 1;
        if (i >= hq) break;
        const float* row = src + size_t(r) * w * 3;
        const int n3 = w * 3;
        const uint32_t* rowu = reinterpret_cast<const uint32_t*>(row);
        for (int k = 0; k < n3; ++k) {
          const uint32_t x = rowu[k];
          tmp[k] = (uint16_t)((x + 0x7fffu + ((x >> 16) & 1u)) >> 16);
        }
        for (int px = 0; px < 2; ++px) {
          // cols: 2j+px-3 in [0, w) -> j in [(4-px)/2, (w+2-px)/2]
          const int j0 = (3 - px + 1) / 2;
          int j1 = (w - 1 + 3 - px) / 2;
          if (j1 >= wq) j1 = wq - 1;
          for (int c = 0; c < 3; ++c) {
            uint16_t* drow = obase + ((py * 2 + px) * 3 + c)
                                     * size_t(hq) * wq + size_t(i) * wq;
            const uint16_t* p = tmp.data() + (2 * j0 + px - 3) * 3 + c;
            for (int j = j0; j <= j1; ++j, p += 6) drow[j] = *p;
          }
        }
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < workers; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return 0;
}

// Decode one image to a caller buffer (for probing / parity tests).
// Returns 0 on success and writes (h, w) to out_hw; the caller then calls
// again with a large-enough buffer. If buf_size < h*w*3 nothing is written.
int i2v_decode(const char* path, uint8_t* buf, long buf_size,
               int32_t* out_hw) {
  Image im = decode_file(path);
  if (!im.ok) return 1;
  out_hw[0] = im.h;
  out_hw[1] = im.w;
  const long need = long(im.h) * im.w * 3;
  if (buf && buf_size >= need) std::memcpy(buf, im.bgr.data(), need);
  return 0;
}

}  // extern "C"
