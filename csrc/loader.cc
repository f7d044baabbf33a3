// satae native data loader: multithreaded JPEG decode into a contiguous
// uint8 tensor.
//
// This is the TPU-native replacement for the reference's implicit native
// ingest layer (torchvision ImageFolder -> PIL/libjpeg single-threaded
// per-image decode, SURVEY.md §2 native-components table, Report.md:23).
// The reference decodes every image O(epochs x configs) times on one thread;
// here the whole dataset is decoded exactly once, across all cores, into the
// array cache that the device pipeline consumes.
//
// Exposed C ABI (ctypes bindings in satae/io/native_loader.py):
//   satae_decode_jpeg_batch(paths, n, H, W, out, n_threads) -> n_failed
//
// (A threaded batch-gather primitive once lived here for a host batching
// runtime; the HBM-resident epoch design obsoleted it and a measured probe
// showed it losing to np.take at batch granularity on this host — removed,
// see docs/PERF.md.)
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cc -o libsatae_loader.so
//        -ljpeg -lpthread

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB and box-resample it into out (H x W x 3).
// Returns true on success.
bool decode_one(const char* path, int out_h, int out_w, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = cinfo.output_height, w = cinfo.output_width;
  const int ch = cinfo.output_components;  // 3 after JCS_RGB
  std::vector<uint8_t> row(static_cast<size_t>(w) * ch);
  JSAMPROW rowp = row.data();

  if (h == out_h && w == out_w && ch == 3) {
    // fast path: decode straight into the output tensor (EuroSAT is 64x64)
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* dst = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
      JSAMPROW r = dst;
      jpeg_read_scanlines(&cinfo, &r, 1);
    }
  } else {
    // general path: decode full image then nearest-neighbor resample
    std::vector<uint8_t> full(static_cast<size_t>(h) * w * ch);
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW r = full.data() + static_cast<size_t>(cinfo.output_scanline) * w * ch;
      jpeg_read_scanlines(&cinfo, &r, 1);
    }
    for (int y = 0; y < out_h; ++y) {
      const int sy = static_cast<int>((y + 0.5) * h / out_h);
      for (int x = 0; x < out_w; ++x) {
        const int sx = static_cast<int>((x + 0.5) * w / out_w);
        const uint8_t* src = full.data() + (static_cast<size_t>(sy) * w + sx) * ch;
        uint8_t* dst = out + (static_cast<size_t>(y) * out_w + x) * 3;
        dst[0] = src[0];
        dst[1] = ch > 1 ? src[1] : src[0];
        dst[2] = ch > 2 ? src[2] : src[0];
      }
    }
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Decode n JPEGs (NUL-separated path buffer) into out (n x H x W x 3 uint8),
// fanned out over n_threads workers. Returns the number of failed decodes
// (failed slots are zero-filled).
int satae_decode_jpeg_batch(const char* paths, int n, int out_h, int out_w,
                            uint8_t* out, int n_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;

  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* dst = out + i * img_bytes;
      if (!decode_one(ptrs[i], out_h, out_w, dst)) {
        memset(dst, 0, img_bytes);
        failed.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
