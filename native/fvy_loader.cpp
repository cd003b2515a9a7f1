// fvy_loader: native batched JPEG decode + staging for the TPU input pipeline.
//
// The reference feeds its accelerator through keras Sequence worker *processes*
// (reference src/space/face_detection.py:612-627) and an ipyparallel cluster
// (face_identification.py:175-198) — python-level task parallelism around
// python imread. This library is the framework's native runtime equivalent:
// libjpeg decode on a std::thread pool, writing RGB pixels directly into the
// caller-owned staging buffer the device letterbox consumes (top-left packed,
// (n, max_h, max_w, 3) uint8) — no PIL objects, no GIL, one memcpy per row.
//
// Exposed C ABI (consumed via ctypes from
// face_vijnana_yolov3_tpu/data/native_loader.py):
//   fvy_jpeg_size(path, &h, &w) -> 0 ok / nonzero error
//   fvy_decode_jpeg_batch(paths, n, out, max_h, max_w, dims, n_threads)
//       -> number of failed images; dims[2i],dims[2i+1] = (h,w) or (0,0)
//
// Build: g++ -O3 -shared -fPIC fvy_loader.cpp -ljpeg -o libfvy_loader.so
// (native_loader.py builds it on first use and caches the .so).

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode one file into base (row stride max_w*3). Returns 0 on success.
// scale_num > 0 requests DCT-domain scaled decode at scale_num/8 (libjpeg
// reduced IDCT: a 3/8 decode of a 720p frame does ~1/7 the IDCT + color
// work of a full decode — the host-side lever for the streaming pipeline,
// replacing the reference's full-res host imread+resize loop,
// reference src/space/face_detection.py:656-697).
int decode_one(const char* path, unsigned char* base, int max_h, int max_w,
               int* out_h, int* out_w, int scale_num = 0) {
  *out_h = 0;
  *out_w = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  // Constructed BEFORE setjmp: a mid-scanline error longjmps back across the
  // scan loop, and jumping over the lifetime of an object with a nontrivial
  // destructor is UB (practically: the row buffer would leak per failed
  // decode). Living above the jump target, it destructs on every exit path.
  std::vector<unsigned char> row;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale/CMYK sources convert
  if (scale_num > 0) {
    cinfo.scale_num = static_cast<unsigned>(scale_num);
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (h > max_h || w > max_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;  // staging buffer too small — caller sizes via fvy_jpeg_size
  }
  row.resize(static_cast<size_t>(w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    std::memcpy(base + static_cast<size_t>(cinfo.output_scanline - 1) *
                           max_w * 3,
                row.data(), static_cast<size_t>(w) * 3);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out_h = h;
  *out_w = w;
  return 0;
}

}  // namespace

extern "C" {

int fvy_jpeg_size(const char* path, int* h, int* w) {
  *h = 0;
  *w = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int fvy_decode_jpeg_batch(const char** paths, int n, unsigned char* out,
                          int max_h, int max_w, int* dims, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> errs(0);
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      unsigned char* base =
          out + static_cast<size_t>(i) * max_h * max_w * 3;
      int h = 0, w = 0;
      if (decode_one(paths[i], base, max_h, max_w, &h, &w) != 0) {
        errs.fetch_add(1);
      }
      dims[2 * i] = h;
      dims[2 * i + 1] = w;
    }
  };
  if (n_threads <= 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return errs.load();
}

// Scaled-decode variant: scale_nums[i]/8 per image (0 = full decode). dims
// reports the ACTUAL decoded size (the library may round a ratio up to the
// nearest it supports — classic libjpeg only does 1/2/4/8 numerators), so
// the caller builds its resize tables from dims, not from a prediction.
int fvy_decode_jpeg_batch_scaled(const char** paths, int n, unsigned char* out,
                                 int max_h, int max_w, int* dims,
                                 int n_threads, const int* scale_nums) {
  std::atomic<int> next(0);
  std::atomic<int> errs(0);
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      unsigned char* base =
          out + static_cast<size_t>(i) * max_h * max_w * 3;
      int h = 0, w = 0;
      if (decode_one(paths[i], base, max_h, max_w, &h, &w,
                     scale_nums[i]) != 0) {
        errs.fetch_add(1);
      }
      dims[2 * i] = h;
      dims[2 * i + 1] = w;
    }
  };
  if (n_threads <= 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return errs.load();
}

}  // extern "C"
