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

// Bilinear uint8 RGB resize (src HxW -> dst SxS).
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int s) {
  const float sy = static_cast<float>(h) / s;
  const float sx = static_cast<float>(w) / s;
  for (int oy = 0; oy < s; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    for (int ox = 0; ox < s; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * w + x0) * 3;
      const uint8_t* p01 = src + (y0 * w + x1) * 3;
      const uint8_t* p10 = src + (y1 * w + x0) * 3;
      const uint8_t* p11 = src + (y1 * w + x1) * 3;
      uint8_t* o = dst + (oy * s + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        o[c] = static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

// Decode one JPEG to (size, size, 3) RGB. Returns true on success.
bool decode_one(const uint8_t* data, long len, int size, uint8_t* out) {
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
  cinfo.out_color_space = JCS_RGB;

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
  std::vector<uint8_t> buf(static_cast<size_t>(ow) * oh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + static_cast<size_t>(cinfo.output_scanline) * ow * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (ow == size && oh == size) {
    std::memcpy(out, buf.data(), static_cast<size_t>(size) * size * 3);
  } else {
    resize_bilinear(buf.data(), oh, ow, out, size);
  }
  return true;
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

}  // extern "C"
