// Native JPEG decode + resize worker pool.
//
// TPU-native replacement for the reference's TF C++ decode_jpeg input stage
// (SURVEY.md §2.7: "TF C++ decode_jpeg → host-side decode workers ... feeding
// pinned buffers"). A pthread pool decodes JPEG byte buffers straight to
// fixed (S, S, 3) uint8 RGB using libjpeg's DCT-domain downscale
// (scale_num/scale_denom) followed by bilinear resize — the whole batch is
// one blocking C call from Python (ctypes releases the GIL), so decode
// parallelism is real OS threads, not Python threads.
//
// C ABI:
//   void* dp_create(int num_threads);
//   void  dp_destroy(void* pool);
//   int   dp_decode_batch(void* pool, int n,
//                         const unsigned char** jpegs, const long* lens,
//                         int size, unsigned char* out /* n*size*size*3 */);
//   returns 0 on success, else the count of failed images (their slots are
//   zero-filled — caller may drop or keep them).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Bilinear uint8 RGB resize (src HxW -> dst SxS), separable 2-pass with
// 8-bit fixed-point weights: horizontal shrink first (w -> s, row-major
// sequential reads, vectorizable inner loop), then vertical on the reduced
// (h, s) intermediate — ~w/s fewer lerps than the naive per-pixel form.
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int s) {
  std::vector<int> x0(s), x1(s), y0(s), y1(s);
  std::vector<int> wx(s), wy(s);  // weights in [0, 256]
  auto plan = [](int n_src, int n_dst, int* i0, int* i1, int* wt) {
    const float scale = static_cast<float>(n_src) / n_dst;
    for (int o = 0; o < n_dst; ++o) {
      float f = (o + 0.5f) * scale - 0.5f;
      if (f < 0) f = 0;
      int i = static_cast<int>(f);
      i0[o] = i;
      i1[o] = i + 1 < n_src ? i + 1 : n_src - 1;
      wt[o] = static_cast<int>((f - i) * 256.0f + 0.5f);
    }
  };
  plan(w, s, x0.data(), x1.data(), wx.data());
  plan(h, s, y0.data(), y1.data(), wy.data());

  // pass 1: horizontal w -> s on every source row
  std::vector<uint8_t> mid(static_cast<size_t>(h) * s * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    uint8_t* out = mid.data() + static_cast<size_t>(y) * s * 3;
    for (int ox = 0; ox < s; ++ox) {
      const uint8_t* a = row + x0[ox] * 3;
      const uint8_t* b = row + x1[ox] * 3;
      const int t = wx[ox];
      uint8_t* o = out + ox * 3;
      o[0] = static_cast<uint8_t>((a[0] * (256 - t) + b[0] * t + 128) >> 8);
      o[1] = static_cast<uint8_t>((a[1] * (256 - t) + b[1] * t + 128) >> 8);
      o[2] = static_cast<uint8_t>((a[2] * (256 - t) + b[2] * t + 128) >> 8);
    }
  }
  // pass 2: vertical h -> s on the reduced rows
  for (int oy = 0; oy < s; ++oy) {
    const uint8_t* a = mid.data() + static_cast<size_t>(y0[oy]) * s * 3;
    const uint8_t* b = mid.data() + static_cast<size_t>(y1[oy]) * s * 3;
    const int t = wy[oy];
    uint8_t* o = dst + static_cast<size_t>(oy) * s * 3;
    const int n = s * 3;
    for (int i = 0; i < n; ++i) {
      o[i] = static_cast<uint8_t>((a[i] * (256 - t) + b[i] * t + 128) >> 8);
    }
  }
}

// Decode one JPEG to (size, size, 3) interleaved pixels in `cs` (JCS_RGB
// or JCS_YCbCr — the latter skips libjpeg's color transform entirely since
// JPEG data is natively YCbCr). Grayscale sources are decoded as 1-channel
// and expanded (g,g,g) for RGB / (Y,128,128) for YCbCr. Returns true on
// success.
bool decode_interleaved(const uint8_t* data, long len, int size,
                        J_COLOR_SPACE cs, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  const bool gray =
      cs == JCS_YCbCr && cinfo.jpeg_color_space == JCS_GRAYSCALE;
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : cs;

  // Deepest DCT-domain downscale (1/2, 1/4, 1/8) that still oversamples the
  // target — skips most of the IDCT work.
  const int w = cinfo.image_width, h = cinfo.image_height;
  int denom = 1;
  while (denom < 8 && (w / (denom * 2)) >= size && (h / (denom * 2)) >= size)
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  const int ow = cinfo.output_width, oh = cinfo.output_height;
  const int comps = cinfo.output_components;  // 1 (gray) or 3
  std::vector<uint8_t> buf(static_cast<size_t>(ow) * oh * comps);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        buf.data() + static_cast<size_t>(cinfo.output_scanline) * ow * comps;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (comps == 1) {  // expand gray to 3-channel before the shared resize
    std::vector<uint8_t> buf3(static_cast<size_t>(ow) * oh * 3);
    for (size_t i = 0, n = static_cast<size_t>(ow) * oh; i < n; ++i) {
      buf3[i * 3] = buf[i];
      buf3[i * 3 + 1] = 128;
      buf3[i * 3 + 2] = 128;
    }
    buf.swap(buf3);
  }

  if (ow == size && oh == size) {
    std::memcpy(out, buf.data(), static_cast<size_t>(size) * size * 3);
  } else {
    resize_bilinear(buf.data(), oh, ow, out, size);
  }
  return true;
}

// Decode one JPEG to (size, size, 3) RGB. Returns true on success.
bool decode_one(const uint8_t* data, long len, int size, uint8_t* out) {
  return decode_interleaved(data, len, size, JCS_RGB, out);
}

// Single-channel bilinear resize, same separable fixed-point scheme as
// resize_bilinear above. `stride` is the source row pitch in bytes.
void resize_bilinear_1ch(const uint8_t* src, int h, int w, int stride,
                         uint8_t* dst, int oh, int ow) {
  std::vector<int> x0(ow), x1(ow), y0(oh), y1(oh);
  std::vector<int> wx(ow), wy(oh);
  auto plan = [](int n_src, int n_dst, int* i0, int* i1, int* wt) {
    const float scale = static_cast<float>(n_src) / n_dst;
    for (int o = 0; o < n_dst; ++o) {
      float f = (o + 0.5f) * scale - 0.5f;
      if (f < 0) f = 0;
      int i = static_cast<int>(f);
      i0[o] = i;
      i1[o] = i + 1 < n_src ? i + 1 : n_src - 1;
      wt[o] = static_cast<int>((f - i) * 256.0f + 0.5f);
    }
  };
  plan(w, ow, x0.data(), x1.data(), wx.data());
  plan(h, oh, y0.data(), y1.data(), wy.data());
  std::vector<uint8_t> mid(static_cast<size_t>(h) * ow);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * stride;
    uint8_t* o = mid.data() + static_cast<size_t>(y) * ow;
    for (int ox = 0; ox < ow; ++ox) {
      const int t = wx[ox];
      o[ox] = static_cast<uint8_t>(
          (row[x0[ox]] * (256 - t) + row[x1[ox]] * t + 128) >> 8);
    }
  }
  for (int oy = 0; oy < oh; ++oy) {
    const uint8_t* a = mid.data() + static_cast<size_t>(y0[oy]) * ow;
    const uint8_t* b = mid.data() + static_cast<size_t>(y1[oy]) * ow;
    const int t = wy[oy];
    uint8_t* o = dst + static_cast<size_t>(oy) * ow;
    for (int i = 0; i < ow; ++i) {
      o[i] = static_cast<uint8_t>((a[i] * (256 - t) + b[i] * t + 128) >> 8);
    }
  }
}

// Fast path for 4:2:0 YCbCr sources (the overwhelmingly common JPEG
// layout): jpeg_read_raw_data hands back the native downsampled planes,
// skipping libjpeg's chroma upsampling and our interleave/strip/subsample
// round trip; each plane is then resized directly (1-channel passes, the
// chroma at size/2). Returns false if the source isn't plain 4:2:0 —
// caller falls back to the general interleaved path.
bool decode_one_yuv420_raw(const uint8_t* data, long len, int size,
                           uint8_t* out_y, uint8_t* out_uv) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space != JCS_YCbCr || cinfo.num_components != 3 ||
      cinfo.comp_info[0].h_samp_factor != 2 ||
      cinfo.comp_info[0].v_samp_factor != 2 ||
      cinfo.comp_info[1].h_samp_factor != 1 ||
      cinfo.comp_info[1].v_samp_factor != 1 ||
      cinfo.comp_info[2].h_samp_factor != 1 ||
      cinfo.comp_info[2].v_samp_factor != 1) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.raw_data_out = TRUE;
  cinfo.do_fancy_upsampling = FALSE;

  const int w = cinfo.image_width, h = cinfo.image_height;
  int denom = 1;
  while (denom < 8 && (w / (denom * 2)) >= size && (h / (denom * 2)) >= size)
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  // Per-component geometry. NB classic-IJG scaling only shrinks the
  // DCT_scaled_size of components it can: at scale 1/2 the luma IDCT runs
  // 4x4 but chroma stays 8x8, so the chroma plane comes out the SAME size
  // as the scaled luma (e.g. 640x360 + 640x360 chroma for a 1280x720
  // 4:2:0 source at 1/2). Rows-per-call and buffer sizes must come from
  // each component's v_samp_factor * DCT_scaled_size, not from assuming
  // "chroma = luma/2".
  const int yw = cinfo.comp_info[0].downsampled_width;
  const int yh = cinfo.comp_info[0].downsampled_height;
  const int cw = cinfo.comp_info[1].downsampled_width;
  const int ch = cinfo.comp_info[1].downsampled_height;
  const int y_rows =
      cinfo.comp_info[0].v_samp_factor * cinfo.comp_info[0].DCT_scaled_size;
  const int c_rows =
      cinfo.comp_info[1].v_samp_factor * cinfo.comp_info[1].DCT_scaled_size;
  const int n_calls = (yh + y_rows - 1) / y_rows;
  const int ypad = n_calls * y_rows;
  const int cpad = n_calls * c_rows;
  // libjpeg may write up to a whole DCT block width — pad row strides.
  const int ystride = ((yw + 15) / 16) * 16;
  const int cstride = ((cw + 15) / 16) * 16;

  std::vector<uint8_t> ybuf(static_cast<size_t>(ypad) * ystride);
  std::vector<uint8_t> cbbuf(static_cast<size_t>(cpad) * cstride);
  std::vector<uint8_t> crbuf(static_cast<size_t>(cpad) * cstride);
  std::vector<JSAMPROW> yrows(ypad), cbrows(cpad), crrows(cpad);
  for (int i = 0; i < ypad; ++i)
    yrows[i] = ybuf.data() + static_cast<size_t>(i) * ystride;
  for (int i = 0; i < cpad; ++i) {
    cbrows[i] = cbbuf.data() + static_cast<size_t>(i) * cstride;
    crrows[i] = crbuf.data() + static_cast<size_t>(i) * cstride;
  }
  int call = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW* yp = &yrows[static_cast<size_t>(call) * y_rows];
    JSAMPROW* cbp = &cbrows[static_cast<size_t>(call) * c_rows];
    JSAMPROW* crp = &crrows[static_cast<size_t>(call) * c_rows];
    JSAMPARRAY planes[3] = {yp, cbp, crp};
    if (jpeg_read_raw_data(&cinfo, planes, y_rows) == 0) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
    ++call;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  const int half = size / 2;
  if (yh == size && yw == size && ystride == size) {
    std::memcpy(out_y, ybuf.data(), static_cast<size_t>(size) * size);
  } else {
    resize_bilinear_1ch(ybuf.data(), yh, yw, ystride, out_y, size, size);
  }
  std::vector<uint8_t> cb(static_cast<size_t>(half) * half);
  std::vector<uint8_t> cr(static_cast<size_t>(half) * half);
  resize_bilinear_1ch(cbbuf.data(), ch, cw, cstride, cb.data(), half, half);
  resize_bilinear_1ch(crbuf.data(), ch, cw, cstride, cr.data(), half, half);
  for (size_t i = 0, n = static_cast<size_t>(half) * half; i < n; ++i) {
    out_uv[i * 2] = cb[i];
    out_uv[i * 2 + 1] = cr[i];
  }
  return true;
}

// Decode one JPEG to planar YUV420: Y (size, size) + interleaved CbCr
// (size/2, size/2, 2). Halves the bytes shipped to the accelerator vs RGB
// (1.5 B/px vs 3 B/px) at no fidelity cost worth naming: JPEG chroma is
// already 4:2:0-subsampled at the source, and the device reconstructs RGB
// in the fused preprocess program (data/augment.py yuv420_to_rgb_batch).
// `size` must be even.
bool decode_one_yuv420(const uint8_t* data, long len, int size,
                       uint8_t* out_y, uint8_t* out_uv) {
  if (decode_one_yuv420_raw(data, len, size, out_y, out_uv)) return true;
  std::vector<uint8_t> ycc(static_cast<size_t>(size) * size * 3);
  if (!decode_interleaved(data, len, size, JCS_YCbCr, ycc.data()))
    return false;
  const int half = size / 2;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row = ycc.data() + static_cast<size_t>(y) * size * 3;
    uint8_t* dst = out_y + static_cast<size_t>(y) * size;
    for (int x = 0; x < size; ++x) dst[x] = row[x * 3];
  }
  for (int cy = 0; cy < half; ++cy) {
    const uint8_t* r0 = ycc.data() + static_cast<size_t>(2 * cy) * size * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(size) * 3;
    uint8_t* dst = out_uv + static_cast<size_t>(cy) * half * 2;
    for (int cx = 0; cx < half; ++cx) {
      const int o = 2 * cx * 3;
      dst[cx * 2] = static_cast<uint8_t>(
          (r0[o + 1] + r0[o + 4] + r1[o + 1] + r1[o + 4] + 2) >> 2);
      dst[cx * 2 + 1] = static_cast<uint8_t>(
          (r0[o + 2] + r0[o + 5] + r1[o + 2] + r1[o + 5] + 2) >> 2);
    }
  }
  return true;
}

// RGB (size, size, 3) interleaved → planar Y + 2x2-mean CbCr, fixed-point
// BT.601 full-range (the same matrix the JPEG path uses). Chroma is
// computed on the 2x2-averaged RGB — identical to averaging full-res
// chroma (the transform is linear) at a quarter of the multiplies.
void rgb_to_yuv420(const uint8_t* rgb, int size, uint8_t* out_y,
                   uint8_t* out_uv) {
  const int half = size / 2;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row = rgb + static_cast<size_t>(y) * size * 3;
    uint8_t* dst = out_y + static_cast<size_t>(y) * size;
    for (int x = 0; x < size; ++x) {
      const uint8_t* p = row + x * 3;
      dst[x] = static_cast<uint8_t>((77 * p[0] + 150 * p[1] + 29 * p[2] + 128) >> 8);
    }
  }
  for (int cy = 0; cy < half; ++cy) {
    const uint8_t* r0 = rgb + static_cast<size_t>(2 * cy) * size * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(size) * 3;
    uint8_t* dst = out_uv + static_cast<size_t>(cy) * half * 2;
    for (int cx = 0; cx < half; ++cx) {
      const int o = 2 * cx * 3;
      const int r = r0[o] + r0[o + 3] + r1[o] + r1[o + 3];
      const int g = r0[o + 1] + r0[o + 4] + r1[o + 1] + r1[o + 4];
      const int b = r0[o + 2] + r0[o + 5] + r1[o + 2] + r1[o + 5];
      // inputs are 4x-summed ⇒ >>10 instead of >>8
      dst[cx * 2] = static_cast<uint8_t>(
          ((-43 * r - 85 * g + 128 * b + 512) >> 10) + 128);
      dst[cx * 2 + 1] = static_cast<uint8_t>(
          ((128 * r - 107 * g - 21 * b + 512) >> 10) + 128);
    }
  }
}

struct Pool {
  std::vector<std::thread> threads;
  std::queue<std::function<void()>> q;
  std::mutex m;
  std::condition_variable cv;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      threads.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(m);
            cv.wait(lk, [this] { return stop || !q.empty(); });
            if (stop && q.empty()) return;
            job = std::move(q.front());
            q.pop();
          }
          job();
        }
      });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(m);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : threads) t.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(m);
      q.push(std::move(job));
    }
    cv.notify_one();
  }
};

struct Latch {
  std::mutex m;
  std::condition_variable cv;
  int remaining;
  explicit Latch(int n) : remaining(n) {}
  void count_down() {
    std::lock_guard<std::mutex> lk(m);
    if (--remaining == 0) cv.notify_all();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(m);
    cv.wait(lk, [this] { return remaining == 0; });
  }
};

}  // namespace

extern "C" {

void* dp_create(int num_threads) {
  if (num_threads < 1) num_threads = 1;
  return new Pool(num_threads);
}

void dp_destroy(void* pool) { delete static_cast<Pool*>(pool); }

int dp_decode_batch(void* pool, int n, const unsigned char** jpegs,
                    const long* lens, int size, unsigned char* out) {
  Pool* p = static_cast<Pool*>(pool);
  Latch latch(n);
  std::vector<int> failed(n, 0);
  const size_t stride = static_cast<size_t>(size) * size * 3;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      uint8_t* dst = out + stride * i;
      if (!decode_one(jpegs[i], lens[i], size, dst)) {
        std::memset(dst, 0, stride);
        failed[i] = 1;
      }
      latch.count_down();
    });
  }
  latch.wait();
  int nfail = 0;
  for (int i = 0; i < n; ++i) nfail += failed[i];
  return nfail;
}

// Batch variant of decode_one_yuv420: out_y is n*size*size bytes, out_uv is
// n*(size/2)*(size/2)*2 bytes. Same failure contract as dp_decode_batch.
int dp_decode_batch_yuv420(void* pool, int n, const unsigned char** jpegs,
                           const long* lens, int size, unsigned char* out_y,
                           unsigned char* out_uv) {
  Pool* p = static_cast<Pool*>(pool);
  Latch latch(n);
  std::vector<int> failed(n, 0);
  const size_t ystride = static_cast<size_t>(size) * size;
  const size_t uvstride = static_cast<size_t>(size / 2) * (size / 2) * 2;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      uint8_t* dy = out_y + ystride * i;
      uint8_t* duv = out_uv + uvstride * i;
      if (!decode_one_yuv420(jpegs[i], lens[i], size, dy, duv)) {
        std::memset(dy, 0, ystride);
        std::memset(duv, 128, uvstride);
        failed[i] = 1;
      }
      latch.count_down();
    });
  }
  latch.wait();
  int nfail = 0;
  for (int i = 0; i < n; ++i) nfail += failed[i];
  return nfail;
}

// Streaming fast path: already-decoded RGB frames (n, h, w, 3) → bilinear
// resize to (size, size) → planar YUV420, one worker per frame. Replaces
// per-frame cv2.resize + numpy color math on the hot video path
// (infer.Predictor / BASELINE config 5) with one GIL-releasing call.
int dp_resize_yuv420_batch(void* pool, int n, const unsigned char* frames,
                           int h, int w, int size, unsigned char* out_y,
                           unsigned char* out_uv) {
  Pool* p = static_cast<Pool*>(pool);
  Latch latch(n);
  const size_t fstride = static_cast<size_t>(h) * w * 3;
  const size_t ystride = static_cast<size_t>(size) * size;
  const size_t uvstride = static_cast<size_t>(size / 2) * (size / 2) * 2;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      std::vector<uint8_t> rgb(static_cast<size_t>(size) * size * 3);
      const uint8_t* src = frames + fstride * i;
      if (h == size && w == size) {
        std::memcpy(rgb.data(), src, rgb.size());
      } else {
        resize_bilinear(src, h, w, rgb.data(), size);
      }
      rgb_to_yuv420(rgb.data(), size, out_y + ystride * i,
                    out_uv + uvstride * i);
      latch.count_down();
    });
  }
  latch.wait();
  return 0;
}

}  // extern "C"
