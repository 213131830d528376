// tecoloader — native host-side data path for TecoRecords stores.
//
// The training input pipeline's hot loop is: gather a temporal clip of
// frames from the mmap'd blob, crop each frame, apply the dihedral
// augmentation (flip none/h/w x rot90 k) and convert uint8 -> f32 in
// [0,1]. In Python this costs several memcpys (crop copy, np.flip/rot90
// materialisation, np.stack into the batch) and a full-precision astype
// per sample; at the throughput a TPU chip sustains (hundreds of clips/s)
// the host loader becomes the bottleneck (SURVEY.md §7, hard part 8).
// This library does the whole sample assembly — gather + crop + aug +
// dtype — in ONE pass straight into the caller's batch slot,
// multithreaded across frames, and is called through ctypes (the GIL is
// released for the duration of the call).
//
// The augmentation is passed as an affine index map (the 12 dihedral
// variants are all affine): output pixel (ro, co) of frame i reads input
// pixel (tops[i] + r0 + ro*drr + co*dcr, lefts[i] + c0 + ro*drc + co*dcc).
// The Python side derives (r0, c0, drr, drc, dcr, dcc) by pushing an
// identity index grid through the SAME numpy flip/rot90 ops the fallback
// path applies (data/native.py::aug_coeffs), so the two paths cannot
// drift.
//
// Build: make -C native   (produces libtecoloader.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <type_traits>
#include <vector>

namespace {

// Per-sample thread cap. 4 suits a single-chip host (the Python loader
// already runs num_worker threads over samples, so per-sample threads
// multiply); a pod host assembling dp-scale global batches can raise it
// via teco_set_max_threads (Python: TECOGAN_LOADER_THREADS or
// data.native.set_assembler_threads).
std::atomic<int> g_max_threads{4};

// Run fn(i) for i in [0, t) over up to g_max_threads threads (frames are
// independent).
template <typename Fn>
void parallel_frames(int t, const Fn& fn) {
  const int cap = std::max(1, g_max_threads.load(std::memory_order_relaxed));
  if (t <= 2 || cap == 1) {
    for (int i = 0; i < t; ++i) fn(i);
    return;
  }
  const int n_threads = std::min<int>(t, cap);
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int th = 0; th < n_threads; ++th) {
    pool.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < t) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

void teco_set_max_threads(int32_t n) {
  g_max_threads.store(n < 1 ? 1 : n, std::memory_order_relaxed);
}

int32_t teco_get_max_threads() {
  return g_max_threads.load(std::memory_order_relaxed);
}

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

  parallel_frames(t, do_frame);
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
  parallel_frames(t, do_frame);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused clip assembly + dihedral augmentation.
//
// Output is (t, csz, csz, c); out[i, ro, co, :] reads the input pixel at
//   row = tops[i]  + r0 + ro*drr + co*dcr
//   col = lefts[i] + c0 + ro*drc + co*dcc
// of frame i (stored h*w*c uint8 at blob + frame_offsets[i]). The affine
// coefficients encode one of the 12 flip x rot90 variants over the
// csz x csz crop, so crop + augmentation collapse into a single gather —
// the host twin of the device-resident loader's index-map gather
// (data/device_data.py::dihedral_maps).

namespace {

struct AugMap {
  int32_t csz, r0, c0, drr, drc, dcr, dcc;
};

// Gathers one output row: source pixel steps by (dcr, dcc) per output col.
// `Store` converts a source pixel (c channel bytes) into the destination.
template <typename Store>
inline void gather_row(const uint8_t* src_frame, int w, int c, int64_t src_r,
                       int64_t src_c, int dcr, int dcc, int csz,
                       const Store& store) {
  const int64_t step = (int64_t)dcr * w + dcc;  // source step in pixels
  const uint8_t* src = src_frame + (src_r * w + src_c) * c;
  if (c == 3) {  // the RGB fast lane (every shipped dataset)
    for (int co = 0; co < csz; ++co, src += step * 3) {
      store(co, src);
    }
  } else {
    for (int co = 0; co < csz; ++co, src += step * c) {
      store(co, src);
    }
  }
}

template <typename T>
void assemble_aug(const uint8_t* blob, const int64_t* frame_offsets,
                  int32_t t, int32_t h, int32_t w, int32_t c,
                  const int32_t* tops, const int32_t* lefts, AugMap m,
                  T* out) {
  const int64_t frame_out = (int64_t)m.csz * m.csz * c;
  constexpr bool to_f32 = std::is_same<T, float>::value;

  auto do_frame = [&](int i) {
    const uint8_t* src_frame = blob + frame_offsets[i];
    T* dst_frame = out + (int64_t)i * frame_out;
    for (int ro = 0; ro < m.csz; ++ro) {
      const int64_t src_r = (int64_t)tops[i] + m.r0 + (int64_t)ro * m.drr;
      const int64_t src_c = (int64_t)lefts[i] + m.c0 + (int64_t)ro * m.drc;
      T* d = dst_frame + (int64_t)ro * m.csz * c;
      if (!to_f32 && m.dcr == 0 && m.dcc == 1) {
        // contiguous source row, uint8 destination: plain memcpy
        memcpy(d, src_frame + (src_r * w + src_c) * c, (size_t)m.csz * c);
      } else if (to_f32 && m.dcr == 0 && m.dcc == 1) {
        // contiguous source row, f32 destination: vectorisable convert
        const uint8_t* src = src_frame + (src_r * w + src_c) * c;
        const int n = m.csz * c;
        for (int k = 0; k < n; ++k) d[k] = src[k] / 255.0f;
      } else if (c == 3) {
        gather_row(src_frame, w, 3, src_r, src_c, m.dcr, m.dcc, m.csz,
                   [&](int co, const uint8_t* s) {
                     T* p = d + co * 3;
                     if (to_f32) {
                       p[0] = s[0] / 255.0f;
                       p[1] = s[1] / 255.0f;
                       p[2] = s[2] / 255.0f;
                     } else {
                       p[0] = s[0];
                       p[1] = s[1];
                       p[2] = s[2];
                     }
                   });
      } else {
        gather_row(src_frame, w, c, src_r, src_c, m.dcr, m.dcc, m.csz,
                   [&](int co, const uint8_t* s) {
                     T* p = d + (int64_t)co * c;
                     for (int ch = 0; ch < c; ++ch)
                       p[ch] = to_f32 ? T(s[ch] / 255.0f) : T(s[ch]);
                   });
      }
    }
  };
  parallel_frames(t, do_frame);
}

}  // namespace

extern "C" {

void teco_assemble_clip_aug_f32(const uint8_t* blob,
                                const int64_t* frame_offsets, int32_t t,
                                int32_t h, int32_t w, int32_t c,
                                const int32_t* tops, const int32_t* lefts,
                                int32_t csz, int32_t r0, int32_t c0,
                                int32_t drr, int32_t drc, int32_t dcr,
                                int32_t dcc, float* out) {
  assemble_aug<float>(blob, frame_offsets, t, h, w, c, tops, lefts,
                      {csz, r0, c0, drr, drc, dcr, dcc}, out);
}

void teco_assemble_clip_aug_u8(const uint8_t* blob,
                               const int64_t* frame_offsets, int32_t t,
                               int32_t h, int32_t w, int32_t c,
                               const int32_t* tops, const int32_t* lefts,
                               int32_t csz, int32_t r0, int32_t c0,
                               int32_t drr, int32_t drc, int32_t dcr,
                               int32_t dcc, uint8_t* out) {
  assemble_aug<uint8_t>(blob, frame_offsets, t, h, w, c, tops, lefts,
                        {csz, r0, c0, drr, drc, dcr, dcc}, out);
}

}  // extern "C"
