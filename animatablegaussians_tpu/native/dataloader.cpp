// Native data-loader core: multi-threaded JPEG decode + mask morphology.
//
// The reference hides this work inside torch DataLoader worker *processes*
// (ref: main_avatar.py:335-339, num_workers=8) + cv2; here it is a small
// C++ library driven from Python via ctypes:
//
//   * agt_jpeg_info / agt_decode_jpeg: libjpeg scanline decode into a
//     caller-provided buffer (BGR channel order to match the cv2 convention
//     the whole pipeline uses).
//   * agt_decode_jpeg_batch: a std::thread pool decoding N files in
//     parallel -- no GIL, no worker processes.
//   * agt_boundary_mask: binarize-at-128 + 5x5 erode/dilate boundary band
//     (ref: dataset/dataset_mv_rgb.py:263-285) in one pass.
//
// Build: see native/build.py (g++ -O3 -shared -fPIC ... -ljpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool read_header(const char* path, FILE** fp_out, jpeg_decompress_struct* cinfo,
                 ErrorMgr* jerr) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  cinfo->err = jpeg_std_error(&jerr->pub);
  jerr->pub.error_exit = error_exit;
  if (setjmp(jerr->setjmp_buffer)) {
    jpeg_destroy_decompress(cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(cinfo);
  jpeg_stdio_src(cinfo, fp);
  jpeg_read_header(cinfo, TRUE);
  *fp_out = fp;
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills w/h/channels.
int agt_jpeg_info(const char* path, int* w, int* h, int* c) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  FILE* fp = nullptr;
  if (!read_header(path, &fp, &cinfo, &jerr)) return 1;
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  *c = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

// Decode into out (h*w*out_channels uint8). out_channels: 1 (gray) or
// 3 (BGR). Returns 0 on success.
int agt_decode_jpeg(const char* path, uint8_t* out, int out_channels) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  FILE* fp = nullptr;
  if (!read_header(path, &fp, &cinfo, &jerr)) return 1;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  cinfo.out_color_space = out_channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int row_ch = cinfo.output_components;
  std::vector<uint8_t> row(static_cast<size_t>(w) * row_ch);
  JSAMPROW rowptr = row.data();
  int y = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    uint8_t* dst = out + static_cast<size_t>(y) * w * out_channels;
    if (out_channels == 1) {
      memcpy(dst, row.data(), w);
    } else {
      // RGB -> BGR (cv2 convention used across the pipeline)
      for (int x = 0; x < w; ++x) {
        dst[3 * x + 0] = row[3 * x + 2];
        dst[3 * x + 1] = row[3 * x + 1];
        dst[3 * x + 2] = row[3 * x + 0];
      }
    }
    ++y;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

// Parallel batch decode: paths[n], each into outs + i*stride_bytes.
// Returns number of failures.
int agt_decode_jpeg_batch(const char** paths, int n, uint8_t* outs,
                          int64_t stride_bytes, int out_channels,
                          int n_threads) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (agt_decode_jpeg(paths[i], outs + static_cast<int64_t>(i) *
                          stride_bytes, out_channels) != 0) {
        failures.fetch_add(1);
      }
    }
  };
  int nt = n_threads > 0 ? n_threads : 8;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Binarize + boundary band (ref: dataset_mv_rgb.py:263-285):
//   bin = raw > 128
//   boundary = (dilate5(bin) - erode5(bin) == 1) || (5 < raw < 250)
void agt_boundary_mask(const uint8_t* raw, int h, int w, int ksize,
                       uint8_t* binarized, uint8_t* boundary) {
  const int r = ksize / 2;
  std::vector<uint8_t> bin(static_cast<size_t>(h) * w);
  for (int i = 0; i < h * w; ++i) bin[i] = raw[i] > 128 ? 1 : 0;

  // separable min/max: rows then columns
  std::vector<uint8_t> rmin(bin.size()), rmax(bin.size());
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = bin.data() + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      uint8_t mn = 1, mx = 0;
      int x0 = x - r > 0 ? x - r : 0;
      int x1 = x + r < w - 1 ? x + r : w - 1;
      for (int k = x0; k <= x1; ++k) {
        mn &= row[k];
        mx |= row[k];
      }
      rmin[static_cast<size_t>(y) * w + x] = mn;
      rmax[static_cast<size_t>(y) * w + x] = mx;
    }
  }
  for (int y = 0; y < h; ++y) {
    int y0 = y - r > 0 ? y - r : 0;
    int y1 = y + r < h - 1 ? y + r : h - 1;
    for (int x = 0; x < w; ++x) {
      uint8_t mn = 1, mx = 0;
      for (int k = y0; k <= y1; ++k) {
        mn &= rmin[static_cast<size_t>(k) * w + x];
        mx |= rmax[static_cast<size_t>(k) * w + x];
      }
      const size_t i = static_cast<size_t>(y) * w + x;
      binarized[i] = bin[i];
      uint8_t band = static_cast<uint8_t>(mx - mn) == 1 ? 1 : 0;
      uint8_t soft = (raw[i] > 5 && raw[i] < 250) ? 1 : 0;
      boundary[i] = (band || soft) ? 1 : 0;
    }
  }
}

}  // extern "C"
