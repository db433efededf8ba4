// tgfr_dataio: native batch image loader for the TGFR input pipeline.
//
// The reference feeds its models through torch's C++ DataLoader machinery
// (num_workers=8 forked workers doing PIL decode + torchvision transforms;
// reference: utils/prepare.py:213-242, utils/dataset_utils.py:57-79). This is
// the TPU-native equivalent: one C++ call decodes, resizes, augments and
// normalizes a whole batch with a real thread pool (no GIL, no worker
// processes, no tensor IPC):
//
//   JPEG decode (libjpeg) -> bilinear resize to HxW -> train augments
//   (grayscale p=0.2, hflip p=0.5, per-image counter-based RNG) ->
//   float32 [-1, 1] NHWC (+ optional RGB->BGR for adaface), or with
//   kFlagU8Out augmented uint8 RGB (uint8-on-the-wire mode: normalize +
//   BGR run on-device, ops/images.device_normalize)
//
// Exposed as a C ABI consumed via ctypes (python: data/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file into an RGB8 buffer (returns w/h; empty on failure).
bool decode_jpeg(const char* path, std::vector<uint8_t>* rgb, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(size_t(*w) * *h * 3);
  const size_t stride = size_t(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// splitmix64: counter-based per-image RNG (stable across thread schedules)
inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

inline double uniform01(uint64_t& s) {
  return (splitmix64(s) >> 11) * (1.0 / 9007199254740992.0);
}

// Bilinear resize RGB8 (sw, sh) -> RGB8 (dw, dh); PIL-style half-pixel grid.
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  if (sw == dw && sh == dh) {
    memcpy(dst, src, size_t(dw) * dh * 3);
    return;
  }
  const float sx = float(sw) / dw;
  const float sy = float(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 >= sh) y1 = sh - 1;
    if (y0 >= sh) y0 = sh - 1;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x1 >= sw) x1 = sw - 1;
      if (x0 >= sw) x0 = sw - 1;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0) * sw + x0) * 3 + c];
        float v01 = src[(size_t(y0) * sw + x1) * 3 + c];
        float v10 = src[(size_t(y1) * sw + x0) * 3 + c];
        float v11 = src[(size_t(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(size_t(y) * dw + x) * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

constexpr int kFlagTrainAug = 1;  // grayscale p=.2 + hflip p=.5
constexpr int kFlagBGR = 2;       // adaface channel permute
constexpr int kFlagU8Out = 4;     // write augmented uint8 RGB (normalize and
                                  // the BGR permute then run on-device:
                                  // ops/images.device_normalize)

// Process one image end to end into out: H*W*3 float32 [-1, 1], or with
// kFlagU8Out H*W*3 uint8 RGB (augmented, not normalized).
bool process_one(const char* path, int out_h, int out_w, void* out_v,
                 uint64_t seed, int flags) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &rgb, &w, &h)) return false;

  std::vector<uint8_t> resized(size_t(out_h) * out_w * 3);
  resize_bilinear(rgb.data(), w, h, resized.data(), out_w, out_h);

  bool gray = false, flip = false;
  if (flags & kFlagTrainAug) {
    uint64_t s = seed;
    gray = uniform01(s) < 0.2;  // torchvision RandomGrayscale(p=0.2)
    flip = uniform01(s) < 0.5;  // RandomHorizontalFlip(p=0.5)
  }
  const bool bgr = flags & kFlagBGR;
  const bool u8 = flags & kFlagU8Out;
  float* outf = u8 ? nullptr : static_cast<float*>(out_v);
  uint8_t* out8 = u8 ? static_cast<uint8_t*>(out_v) : nullptr;

  for (int y = 0; y < out_h; ++y) {
    for (int x = 0; x < out_w; ++x) {
      int sxp = flip ? (out_w - 1 - x) : x;
      const uint8_t* px = &resized[(size_t(y) * out_w + sxp) * 3];
      float r = px[0], g = px[1], b = px[2];
      if (gray) {
        // ITU-R 601-2 luma, matching PIL convert('L')
        float l = roundf(0.299f * r + 0.587f * g + 0.114f * b);
        r = g = b = l;
      }
      if (u8) {
        // augmented RGB; normalize + the BGR permute run on-device with
        // identical math (ops/images.device_normalize)
        uint8_t* o = &out8[(size_t(y) * out_w + x) * 3];
        o[0] = (uint8_t)r; o[1] = (uint8_t)g; o[2] = (uint8_t)b;
        continue;
      }
      float* o = &outf[(size_t(y) * out_w + x) * 3];
      float c0 = r / 255.0f * 2.0f - 1.0f;
      float c1 = g / 255.0f * 2.0f - 1.0f;
      float c2 = b / 255.0f * 2.0f - 1.0f;
      if (bgr) {
        o[0] = c2; o[1] = c1; o[2] = c0;
      } else {
        o[0] = c0; o[1] = c1; o[2] = c2;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode+transform a batch. Returns the number of FAILED images (0 = success).
// paths: n C strings; out: n*out_h*out_w*3 floats (or uint8s with flags & 4);
// seeds: n per-image RNG seeds (only read when flags & 1); n_threads <= 0
// picks hardware threads.
int tgfr_decode_batch(const char** paths, int n, int out_h, int out_w,
                      void* out, const uint64_t* seeds, int flags,
                      int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;

  const size_t elem = (flags & kFlagU8Out) ? sizeof(uint8_t) : sizeof(float);
  const size_t img_bytes = size_t(out_h) * out_w * 3 * elem;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint64_t seed = seeds ? seeds[i] : 0;
      void* dst = static_cast<char*>(out) + size_t(i) * img_bytes;
      if (!process_one(paths[i], out_h, out_w, dst, seed, flags)) {
        memset(dst, 0, img_bytes);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// v2: kFlagU8Out (uint8-on-the-wire mode)
int tgfr_dataio_version() { return 2; }

}  // extern "C"
