// Host-side JPEG decode stage for the fused preprocessing pipeline.
//
// Completes the "decode -> resize -> normalize -> patchify" north star: this
// kernel does the host half (entropy decode + IDCT at the smallest DCT scale
// that still covers the target, then a box-filter area resize to the fixed
// staging shape); the device half (bicubic resize to model resolution, crop,
// normalize, patchify) is the jitted XLA pipeline in
// multimodal_tpu/ops/image.py.
//
// libjpeg's scale_num/scale_denom performs the 8x8 IDCT at 1/1..1/8 scale,
// so a 4032x3024 photo staged to 256x256 only pays the IDCT for ~504x378
// pixels — the dominant cost of naive decode-then-resize disappears.
//
// C ABI (ctypes):
//   mmtpu_decode_jpeg(data, size, out, out_h, out_w) -> 0 on success
//     decodes one JPEG to RGB uint8 (out_h, out_w, 3), aspect squashed
//     (the device stage does the aspect-preserving crop policy).
//
// Build: g++ -O3 -shared -fPIC -o libjpeg_decoder.so jpeg_decoder.cpp -ljpeg

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

// Box-filter area resize (uint8 RGB). Accumulates source pixels whose
// centers fall into each destination cell — a proper anti-aliasing filter
// for the staging downscale, unlike nearest/bilinear point sampling.
void area_resize(const std::vector<uint8_t>& src, int sh, int sw, uint8_t* dst,
                 int dh, int dw) {
  std::vector<uint32_t> acc(static_cast<size_t>(dh) * dw * 3, 0);
  std::vector<uint32_t> cnt(static_cast<size_t>(dh) * dw, 0);
  for (int y = 0; y < sh; ++y) {
    int dy = static_cast<int>((static_cast<int64_t>(y) * dh) / sh);
    if (dy >= dh) dy = dh - 1;
    const uint8_t* srow = src.data() + static_cast<size_t>(y) * sw * 3;
    for (int x = 0; x < sw; ++x) {
      int dx = static_cast<int>((static_cast<int64_t>(x) * dw) / sw);
      if (dx >= dw) dx = dw - 1;
      size_t di = (static_cast<size_t>(dy) * dw + dx);
      acc[di * 3 + 0] += srow[x * 3 + 0];
      acc[di * 3 + 1] += srow[x * 3 + 1];
      acc[di * 3 + 2] += srow[x * 3 + 2];
      cnt[di] += 1;
    }
  }
  // Upscale cells that received no source pixel: fall back to nearest.
  for (int dy = 0; dy < dh; ++dy) {
    for (int dx = 0; dx < dw; ++dx) {
      size_t di = static_cast<size_t>(dy) * dw + dx;
      uint8_t* d = dst + di * 3;
      if (cnt[di] > 0) {
        d[0] = static_cast<uint8_t>(acc[di * 3 + 0] / cnt[di]);
        d[1] = static_cast<uint8_t>(acc[di * 3 + 1] / cnt[di]);
        d[2] = static_cast<uint8_t>(acc[di * 3 + 2] / cnt[di]);
      } else {
        int sy = static_cast<int>((static_cast<int64_t>(dy) * sh) / dh);
        int sx = static_cast<int>((static_cast<int64_t>(dx) * sw) / dw);
        if (sy >= sh) sy = sh - 1;
        if (sx >= sw) sx = sw - 1;
        const uint8_t* s = src.data() + (static_cast<size_t>(sy) * sw + sx) * 3;
        d[0] = s[0];
        d[1] = s[1];
        d[2] = s[2];
      }
    }
  }
}

}  // namespace

extern "C" int mmtpu_decode_jpeg(const uint8_t* data, long size, uint8_t* out,
                                 int out_h, int out_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;

  // Pick the smallest IDCT scale (1/1 .. 1/8) that still covers the target
  // on both axes, so we never upsample out of the DCT domain.
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; denom /= 2) {
    if (static_cast<int>(cinfo.image_width) / denom >= out_w &&
        static_cast<int>(cinfo.image_height) / denom >= out_h) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);

  const int sw = static_cast<int>(cinfo.output_width);
  const int sh = static_cast<int>(cinfo.output_height);
  const int comps = cinfo.output_components;
  std::vector<uint8_t> pixels(static_cast<size_t>(sh) * sw * 3);
  std::vector<uint8_t> row(static_cast<size_t>(sw) * comps);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < sh; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    uint8_t* drow = pixels.data() + static_cast<size_t>(y) * sw * 3;
    if (comps == 3) {
      std::memcpy(drow, row.data(), static_cast<size_t>(sw) * 3);
    } else {  // grayscale -> RGB
      for (int x = 0; x < sw; ++x) {
        drow[x * 3 + 0] = row[x * comps];
        drow[x * 3 + 1] = row[x * comps];
        drow[x * 3 + 2] = row[x * comps];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (sh == out_h && sw == out_w) {
    std::memcpy(out, pixels.data(), pixels.size());
  } else {
    area_resize(pixels, sh, sw, out, out_h, out_w);
  }
  return 0;
}

extern "C" int mmtpu_decode_jpeg_batch(const uint8_t* const* blobs,
                                       const long* sizes, int n, uint8_t* out,
                                       int out_h, int out_w) {
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  for (int i = 0; i < n; ++i) {
    int rc = mmtpu_decode_jpeg(blobs[i], sizes[i], out + i * stride, out_h,
                               out_w);
    if (rc != 0) return rc;
  }
  return 0;
}

// Multi-threaded batch decode: images are independent, so on a real TPU-VM
// host (many cores feeding one chip) decode parallelizes linearly.
extern "C" int mmtpu_decode_jpeg_batch_mt(const uint8_t* const* blobs,
                                          const long* sizes, int n,
                                          uint8_t* out, int out_h, int out_w,
                                          int n_threads) {
  if (n_threads <= 1 || n <= 1) {
    return mmtpu_decode_jpeg_batch(blobs, sizes, n, out, out_h, out_w);
  }
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      int rc = mmtpu_decode_jpeg(blobs[i], sizes[i], out + i * stride, out_h,
                                 out_w);
      if (rc != 0) err.store(rc);
    }
  };
  std::vector<std::thread> threads;
  int k = n_threads < n ? n_threads : n;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return err.load();
}
