// Native batched JPEG decode + resize — the host input-pipeline hot loop.
//
// Role parity: the reference hides per-frame PIL decode behind 8 torch
// DataLoader workers (train_vidreid_xent_htri.py:222-247, reader
// dataset_loader.py:23-36). The TPU host here may have few cores, so the
// per-image cost itself must drop: this extension decodes a whole batch of
// frames per call through libjpeg's C API with zero per-image Python
// overhead, DCT-domain downscaling (decode at 1/2, 1/4, 1/8 when the
// source is larger than the target), and a fixed-point bilinear resize.
//
// Exposed C ABI (ctypes; see agrl_tpu/data/jpeg_native.py):
//   decode_resize_batch(paths, n, height, width, out, sizes, ok, threads)
//     paths  : array of n C strings (file paths)
//     out    : uint8 buffer (n, height, width, 3), filled per image
//     sizes  : int32 buffer (n, 2) — ORIGINAL (w, h) per image
//     ok     : uint8 buffer (n,) — 1 on success, 0 on any failure
//     threads: OpenMP worker count (<=0 -> default)
//
// Failures (missing file, corrupt or TRUNCATED JPEG, allocation failure)
// never throw: ok[i]=0, the output row is zero-filled, and the caller
// falls back to the robust PIL reader (infinite-retry semantics of the
// reference, dataset_loader.py:23-36). Corrupt-data warnings count as
// failures: libjpeg "recovers" from premature EOF by gray-filling the
// remaining scanlines, which must not silently enter the pipeline.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
  int corrupt_warnings;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

// msg_level == -1 is a corrupt-data warning (truncated stream, bad
// marker, extraneous bytes): record it so the decode is marked failed.
// msg_level >= 0 is a trace message: stay silent.
void emit_message(j_common_ptr cinfo, int msg_level) {
  if (msg_level < 0) {
    reinterpret_cast<ErrorMgr*>(cinfo->err)->corrupt_warnings++;
  }
}

// fixed-point (16.16) bilinear resize, RGB u8. src is (sh, sw, 3).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  if (sw == dw && sh == dh) {
    std::memcpy(dst, src, static_cast<size_t>(dw) * dh * 3);
    return;
  }
  // PIL-style half-pixel centers: src_x = (x + 0.5) * sw/dw - 0.5
  const int64_t xstep = (static_cast<int64_t>(sw) << 16) / dw;
  const int64_t ystep = (static_cast<int64_t>(sh) << 16) / dh;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<int> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    int64_t fx = ((2 * x + 1) * xstep - (1 << 16)) / 2;  // (x+0.5)*step - 0.5
    if (fx < 0) fx = 0;
    int xi = static_cast<int>(fx >> 16);
    int frac = static_cast<int>(fx & 0xFFFF);
    x0s[x] = xi;
    x1s[x] = xi + 1 < sw ? xi + 1 : sw - 1;
    wxs[x] = frac;
  }
  for (int y = 0; y < dh; ++y) {
    int64_t fy = ((2 * y + 1) * ystep - (1 << 16)) / 2;
    if (fy < 0) fy = 0;
    int yi = static_cast<int>(fy >> 16);
    int wy = static_cast<int>(fy & 0xFFFF);
    int y1 = yi + 1 < sh ? yi + 1 : sh - 1;
    const uint8_t* r0 = src + static_cast<size_t>(yi) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int x0 = x0s[x] * 3, x1 = x1s[x] * 3, wx = wxs[x];
      for (int c = 0; c < 3; ++c) {
        const int t = r0[x0 + c] + (((r0[x1 + c] - r0[x0 + c]) * wx) >> 16);
        const int b = r1[x0 + c] + (((r1[x1 + c] - r1[x0 + c]) * wx) >> 16);
        drow[x * 3 + c] = static_cast<uint8_t>(t + (((b - t) * wy) >> 16));
      }
    }
  }
}

// decode one JPEG file into dst (dh, dw, 3); writes original (w, h).
// `scratch` is caller-owned: it must NOT be an automatic of this frame —
// objects modified between setjmp and longjmp have indeterminate values
// after the jump; a caller-frame vector's state is well-defined (the heap
// allocation either fully happened or the longjmp fired inside libjpeg,
// never mid-resize).
bool decode_one_impl(const char* path, int dh, int dw, uint8_t* dst,
                     int32_t* size, std::vector<uint8_t>& scratch,
                     std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  // slurp the file (frames are tens of KB; one read beats stdio chatter)
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(len));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  jerr.corrupt_warnings = 0;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), buf.size());
  jpeg_read_header(&cinfo, TRUE);

  size[0] = static_cast<int32_t>(cinfo.image_width);
  size[1] = static_cast<int32_t>(cinfo.image_height);

  // DCT-domain downscale: largest 1/2^k that keeps both dims >= target
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  while (cinfo.scale_denom < 8 &&
         static_cast<int>(cinfo.image_width) /
                 static_cast<int>(2 * cinfo.scale_denom) >= dw &&
         static_cast<int>(cinfo.image_height) /
                 static_cast<int>(2 * cinfo.scale_denom) >= dh) {
    cinfo.scale_denom *= 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int sw = static_cast<int>(cinfo.output_width);
  const int sh = static_cast<int>(cinfo.output_height);
  const bool direct = (sw == dw && sh == dh);
  uint8_t* plane = dst;
  if (!direct) {
    scratch.resize(static_cast<size_t>(sw) * sh * 3);
    plane = scratch.data();
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = plane + static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  const bool clean = jerr.corrupt_warnings == 0;
  jpeg_destroy_decompress(&cinfo);
  if (!clean) return false;  // truncated/corrupt-but-recoverable stream

  if (!direct) resize_bilinear(plane, sw, sh, dst, dw, dh);
  return true;
}

// noexcept shield: nothing (std::bad_alloc from the vectors included) may
// escape across the OpenMP region or the extern "C" boundary.
bool decode_one(const char* path, int dh, int dw, uint8_t* dst, int32_t* size,
                std::vector<uint8_t>& scratch,
                std::vector<uint8_t>& buf) noexcept {
  try {
    return decode_one_impl(path, dh, dw, dst, size, scratch, buf);
  } catch (...) {
    return false;
  }
}

}  // namespace

extern "C" {

void decode_resize_batch(const char** paths, int64_t n, int64_t height,
                         int64_t width, uint8_t* out, int32_t* sizes,
                         uint8_t* ok, int64_t threads) {
  const size_t stride = static_cast<size_t>(height) * width * 3;
#ifdef _OPENMP
  if (threads > 0) omp_set_num_threads(static_cast<int>(threads));
#pragma omp parallel
#endif
  {
    // per-thread scratch, reused across images (capacity persists)
    std::vector<uint8_t> scratch;
    std::vector<uint8_t> buf;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1)
#endif
    for (int64_t i = 0; i < n; ++i) {
      sizes[2 * i] = 0;
      sizes[2 * i + 1] = 0;
      ok[i] = decode_one(paths[i], static_cast<int>(height),
                         static_cast<int>(width), out + i * stride,
                         &sizes[2 * i], scratch, buf)
                  ? 1
                  : 0;
      if (!ok[i]) std::memset(out + i * stride, 0, stride);  // no garbage
    }
  }
}
}
