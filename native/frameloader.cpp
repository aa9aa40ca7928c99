// frameloader — native frame-ingest runtime for siftmetal_tpu.
//
// TPU-native equivalent of the reference's zero-copy camera ingest and
// image conversion utilities (/root/reference
// Sources/SIFTMetal/Utilities/CoreVideoMetalCache.swift:12-33,
// ImageConversion.swift:14-47, and the GPU grayscale kernel
// Sources/MetalShaders/Metal/ConvertSRGBToGrayscale.metal:11-25): on a TPU
// host there is no unified memory, so the fast path is host-side decode +
// pixel conversion into a pinned staging batch that jax device_puts in one
// transfer. This library does the host half: PGM/PPM decode, BT.709
// gamma-space grayscale (the exact constants the pipeline uses), YUV420/
// BGRA conversion, and a multithreaded prefetching batch loader.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// BT.709 luma, gamma space — identical to ConvertSRGBToGrayscale.metal:17-20
// and siftmetal_tpu/ops/image.py.
constexpr float kLumaR = 0.212639005871510f;
constexpr float kLumaG = 0.715168678767756f;
constexpr float kLumaB = 0.072192315360734f;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Pixel conversions (all outputs: float32 in [0, 1]).
// ---------------------------------------------------------------------------

// Interleaved RGB(A) uint8 -> grayscale float32. channels in {3, 4}.
void fl_rgb_to_gray_f32(const uint8_t* rgb, int64_t n_pixels, int channels,
                        float* out) {
  const float s = 1.0f / 255.0f;
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t* p = rgb + i * channels;
    out[i] = (kLumaR * p[0] + kLumaG * p[1] + kLumaB * p[2]) * s;
  }
}

// BGRA uint8 (the reference's camera format, CoreVideoMetalCache.swift:26)
// -> grayscale float32.
void fl_bgra_to_gray_f32(const uint8_t* bgra, int64_t n_pixels, float* out) {
  const float s = 1.0f / 255.0f;
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t* p = bgra + i * 4;
    out[i] = (kLumaR * p[2] + kLumaG * p[1] + kLumaB * p[0]) * s;
  }
}

// Planar YUV420 -> grayscale float32 is just the Y plane rescaled
// (video-range flag applies the 16..235 expansion).
void fl_yuv420_y_to_gray_f32(const uint8_t* y_plane, int64_t n_pixels,
                             int video_range, float* out) {
  if (video_range) {
    const float s = 1.0f / 219.0f;
    for (int64_t i = 0; i < n_pixels; ++i) {
      float v = (static_cast<float>(y_plane[i]) - 16.0f) * s;
      out[i] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
    }
  } else {
    const float s = 1.0f / 255.0f;
    for (int64_t i = 0; i < n_pixels; ++i) out[i] = y_plane[i] * s;
  }
}

// ---------------------------------------------------------------------------
// PGM (P5) / PPM (P6) decode.
// ---------------------------------------------------------------------------

namespace {

bool read_pnm_header(FILE* f, int* magic, int* w, int* h, int* maxval) {
  char m0 = 0, m1 = 0;
  if (fscanf(f, " %c%c", &m0, &m1) != 2 || m0 != 'P') return false;
  *magic = m1 - '0';
  int vals[3];
  int got = 0;
  while (got < 3) {
    int c = fgetc(f);
    if (c == '#') {  // comment line
      while (c != '\n' && c != EOF) c = fgetc(f);
      continue;
    }
    if (c == ' ' || c == '\n' || c == '\r' || c == '\t') continue;
    ungetc(c, f);
    if (fscanf(f, "%d", &vals[got]) != 1) return false;
    ++got;
  }
  fgetc(f);  // single whitespace after maxval
  *w = vals[0];
  *h = vals[1];
  *maxval = vals[2];
  return true;
}

}  // namespace

// Returns 0 on success. Grayscale output [h*w] float32; w/h are outputs.
// Accepts P5 (gray) and P6 (rgb). out must hold max_pixels floats.
int fl_load_pnm_gray(const char* path, float* out, int64_t max_pixels,
                     int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int magic, w, h, maxval;
  // w/h must be validated positive BEFORE computing n: a malformed header
  // with negative dimensions would make n negative, slip past the
  // n > max_pixels check, and turn vector(n*ch) into a huge size_t.
  if (!read_pnm_header(f, &magic, &w, &h, &maxval) ||
      (magic != 5 && magic != 6) || maxval <= 0 || maxval > 255 ||
      w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) {
    fclose(f);
    return -2;
  }
  const int64_t n = static_cast<int64_t>(w) * h;
  if (n > max_pixels) {
    fclose(f);
    return -3;
  }
  const int ch = (magic == 5) ? 1 : 3;
  std::vector<uint8_t> buf(n * ch);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return -4;
  }
  fclose(f);
  const float s = 1.0f / static_cast<float>(maxval);
  if (ch == 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = buf[i] * s;
  } else {
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t* p = buf.data() + i * 3;
      out[i] = (kLumaR * p[0] + kLumaG * p[1] + kLumaB * p[2]) * s;
    }
  }
  *out_w = w;
  *out_h = h;
  return 0;
}

// ---------------------------------------------------------------------------
// Multithreaded prefetching batch loader.
//
// Worker threads pull file paths from a queue, decode into per-slot float32
// buffers; fl_loader_next() hands back completed frames in submission order
// — the host-side analogue of the reference's camera frame pipeline, sized
// so device_put sees ready-made [B, H, W] batches.
// ---------------------------------------------------------------------------

struct FlLoader {
  int width = 0;
  int height = 0;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::queue<std::pair<int64_t, std::string>> work;  // (ticket, path)
  // finished tickets -> buffer
  std::vector<std::pair<int64_t, std::vector<float>>> done;
  int64_t next_ticket = 0;
  int64_t next_out = 0;
  std::atomic<bool> stop{false};
  std::atomic<int> errors{0};
};

static void fl_worker(FlLoader* L) {
  const int64_t n = static_cast<int64_t>(L->width) * L->height;
  while (true) {
    std::pair<int64_t, std::string> job;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_work.wait(lk, [&] { return L->stop || !L->work.empty(); });
      if (L->stop && L->work.empty()) return;
      job = std::move(L->work.front());
      L->work.pop();
    }
    std::vector<float> buf(n, 0.0f);
    int w = 0, h = 0;
    int rc = fl_load_pnm_gray(job.second.c_str(), buf.data(), n, &w, &h);
    if (rc != 0 || w != L->width || h != L->height) L->errors++;
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->done.emplace_back(job.first, std::move(buf));
    }
    L->cv_done.notify_all();
  }
}

void* fl_loader_create(int width, int height, int n_threads) {
  auto* L = new FlLoader;
  L->width = width;
  L->height = height;
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back(fl_worker, L);
  return L;
}

void fl_loader_submit(void* handle, const char* path) {
  auto* L = static_cast<FlLoader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->work.emplace(L->next_ticket++, std::string(path));
  }
  L->cv_work.notify_one();
}

// Blocks until the next frame (in submission order) is decoded; copies it
// into out [height*width]. Returns 0 on success, -1 if nothing pending.
int fl_loader_next(void* handle, float* out) {
  auto* L = static_cast<FlLoader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_out >= L->next_ticket) return -1;
  const int64_t want = L->next_out;
  L->cv_done.wait(lk, [&] {
    for (auto& d : L->done)
      if (d.first == want) return true;
    return false;
  });
  for (size_t i = 0; i < L->done.size(); ++i) {
    if (L->done[i].first == want) {
      std::memcpy(out, L->done[i].second.data(),
                  L->done[i].second.size() * sizeof(float));
      L->done.erase(L->done.begin() + i);
      break;
    }
  }
  L->next_out++;
  return 0;
}

int fl_loader_error_count(void* handle) {
  return static_cast<FlLoader*>(handle)->errors.load();
}

void fl_loader_destroy(void* handle) {
  auto* L = static_cast<FlLoader*>(handle);
  L->stop = true;
  L->cv_work.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
