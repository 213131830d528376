// tecoloader — native host-side data path for TecoRecords stores.
//
// The training input pipeline's hot loop is: gather a temporal clip of
// frames from the mmap'd blob, crop each frame, and convert uint8 -> f32
// in [0,1]. In Python this costs several memcpys and a full-precision
// astype per sample; at the throughput a TPU chip sustains (hundreds of
// clips/s) the host loader becomes the bottleneck (SURVEY.md §7, hard part
// 8). This library does the whole assembly in one pass, multithreaded
// across frames, and is called through ctypes (the GIL is released for the
// duration of the call).
//
// Build: make -C native   (produces libtecoloader.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Open a file with mmap; returns base pointer (or nullptr) and size.
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

void* teco_mmap_open(const char* path, int64_t* size_out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (base == MAP_FAILED) return nullptr;
  *size_out = st.st_size;
  return base;
}

void teco_mmap_close(void* base, int64_t size) {
  if (base) munmap(base, size);
}

// Assemble a clip: for each frame i (offset frame_offsets[i] into the blob,
// stored as h*w*c uint8), crop (tops[i], lefts[i], ch, cw) and write
// float32/255 into out[i]. Parallel across frames.
void teco_assemble_clip_f32(const uint8_t* blob, const int64_t* frame_offsets,
                            int32_t t, int32_t h, int32_t w, int32_t c,
                            const int32_t* tops, const int32_t* lefts,
                            int32_t ch, int32_t cw, float* out) {
  constexpr float kDen = 255.0f;
  const int64_t frame_out = (int64_t)ch * cw * c;

  auto do_frame = [&](int i) {
    const uint8_t* src_frame = blob + frame_offsets[i];
    float* dst = out + (int64_t)i * frame_out;
    const int top = tops[i], left = lefts[i];
    for (int r = 0; r < ch; ++r) {
      const uint8_t* src = src_frame + ((int64_t)(top + r) * w + left) * c;
      float* d = dst + (int64_t)r * cw * c;
      const int n = cw * c;
      int k = 0;
      for (; k + 8 <= n; k += 8) {  // let the compiler vectorise
        d[k + 0] = src[k + 0] / kDen;
        d[k + 1] = src[k + 1] / kDen;
        d[k + 2] = src[k + 2] / kDen;
        d[k + 3] = src[k + 3] / kDen;
        d[k + 4] = src[k + 4] / kDen;
        d[k + 5] = src[k + 5] / kDen;
        d[k + 6] = src[k + 6] / kDen;
        d[k + 7] = src[k + 7] / kDen;
      }
      for (; k < n; ++k) d[k] = src[k] / kDen;
    }
  };

  if (t <= 2) {
    for (int i = 0; i < t; ++i) do_frame(i);
    return;
  }
  const int n_threads = std::min<int>(t, 4);
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int th = 0; th < n_threads; ++th) {
    pool.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < t) do_frame(i);
    });
  }
  for (auto& th : pool) th.join();
}

// Same clip assembly but keeping uint8 (normalisation happens on the TPU;
// shipping uint8 quarters host->device transfer).
void teco_assemble_clip_u8(const uint8_t* blob, const int64_t* frame_offsets,
                           int32_t t, int32_t h, int32_t w, int32_t c,
                           const int32_t* tops, const int32_t* lefts,
                           int32_t ch, int32_t cw, uint8_t* out) {
  const int64_t frame_out = (int64_t)ch * cw * c;
  auto do_frame = [&](int i) {
    const uint8_t* src_frame = blob + frame_offsets[i];
    uint8_t* dst = out + (int64_t)i * frame_out;
    const int top = tops[i], left = lefts[i];
    const size_t row_bytes = (size_t)cw * c;
    for (int r = 0; r < ch; ++r) {
      memcpy(dst + (int64_t)r * cw * c,
             src_frame + ((int64_t)(top + r) * w + left) * c, row_bytes);
    }
  };
  const int n_threads = std::min<int>(t, 4);
  if (t <= 2) {
    for (int i = 0; i < t; ++i) do_frame(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int th = 0; th < n_threads; ++th) {
    pool.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < t) do_frame(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
