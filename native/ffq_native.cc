// fastforward_tpu native runtime: checkpoint quantization kernels.
//
// The load-time hot path of the serving engine: converting dense fp32/bf16
// checkpoints into packed-int4-per-group (or int8 per-channel) storage. For
// an 8B model this touches ~16GB of host memory; the multithreaded C++ path
// keeps model load latency bounded by host memory bandwidth instead of
// Python loop overhead.
//
// Exposed with a plain C ABI (consumed via ctypes from
// fastforward_tpu/native.py). Build: `make -C native` (see native/Makefile).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Run fn(start, end) over [0, n) on all hardware threads.
void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t chunk = (n + hw - 1) / hw;
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < hw; ++t) {
    int64_t start = t * chunk;
    int64_t end = std::min<int64_t>(n, start + chunk);
    if (start >= end) break;
    threads.emplace_back(fn, start, end);
  }
  for (auto& th : threads) th.join();
}

inline float bf16_to_f32(uint16_t v) {
  uint32_t bits = static_cast<uint32_t>(v) << 16;
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

}  // namespace

extern "C" {

// Per-group symmetric int4 quantization + packing along K.
//
// w:       (K, N) row-major float32
// packed:  (K/2, N) int8 output — group-halves layout: within each group of
//          `group_size` rows, packed row i holds original row i (low nibble)
//          and row i + group_size/2 (high nibble). Matches
//          fastforward_tpu.kernels.packing.pack_int4.
// scales:  (K/group_size, N) float32 output.
void ffq_quantize_pack_int4_f32(const float* w, int64_t K, int64_t N,
                                int64_t group_size, int8_t* packed,
                                float* scales) {
  const int64_t n_groups = K / group_size;
  const int64_t half = group_size / 2;
  parallel_for(n_groups, [&](int64_t g0, int64_t g1) {
    for (int64_t g = g0; g < g1; ++g) {
      const float* wg = w + g * group_size * N;
      float* sg = scales + g * N;
      // per-column absmax over the group
      for (int64_t n = 0; n < N; ++n) sg[n] = 0.f;
      for (int64_t k = 0; k < group_size; ++k) {
        const float* row = wg + k * N;
        for (int64_t n = 0; n < N; ++n) {
          float a = std::fabs(row[n]);
          if (a > sg[n]) sg[n] = a;
        }
      }
      for (int64_t n = 0; n < N; ++n) {
        sg[n] = sg[n] > 0.f ? sg[n] / 7.0f : 1e-8f;
      }
      // quantize + pack
      int8_t* pg = packed + g * half * N;
      for (int64_t i = 0; i < half; ++i) {
        const float* lo = wg + i * N;
        const float* hi = wg + (i + half) * N;
        int8_t* out = pg + i * N;
        for (int64_t n = 0; n < N; ++n) {
          int ql = static_cast<int>(std::lround(lo[n] / sg[n]));
          int qh = static_cast<int>(std::lround(hi[n] / sg[n]));
          ql = std::clamp(ql, -8, 7);
          qh = std::clamp(qh, -8, 7);
          out[n] = static_cast<int8_t>((ql & 0xF) | (qh << 4));
        }
      }
    }
  });
}

// Same, bf16 input (raw uint16 words).
void ffq_quantize_pack_int4_bf16(const uint16_t* w, int64_t K, int64_t N,
                                 int64_t group_size, int8_t* packed,
                                 float* scales) {
  const int64_t n_groups = K / group_size;
  const int64_t half = group_size / 2;
  parallel_for(n_groups, [&](int64_t g0, int64_t g1) {
    std::vector<float> buf;
    for (int64_t g = g0; g < g1; ++g) {
      const uint16_t* wg = w + g * group_size * N;
      float* sg = scales + g * N;
      for (int64_t n = 0; n < N; ++n) sg[n] = 0.f;
      for (int64_t k = 0; k < group_size; ++k) {
        const uint16_t* row = wg + k * N;
        for (int64_t n = 0; n < N; ++n) {
          float a = std::fabs(bf16_to_f32(row[n]));
          if (a > sg[n]) sg[n] = a;
        }
      }
      for (int64_t n = 0; n < N; ++n) sg[n] = sg[n] > 0.f ? sg[n] / 7.0f : 1e-8f;
      int8_t* pg = packed + g * half * N;
      for (int64_t i = 0; i < half; ++i) {
        const uint16_t* lo = wg + i * N;
        const uint16_t* hi = wg + (i + half) * N;
        int8_t* out = pg + i * N;
        for (int64_t n = 0; n < N; ++n) {
          int ql = static_cast<int>(std::lround(bf16_to_f32(lo[n]) / sg[n]));
          int qh = static_cast<int>(std::lround(bf16_to_f32(hi[n]) / sg[n]));
          ql = std::clamp(ql, -8, 7);
          qh = std::clamp(qh, -8, 7);
          out[n] = static_cast<int8_t>((ql & 0xF) | (qh << 4));
        }
      }
    }
  });
}

// Per-out-channel symmetric int8 quantization.
// w: (K, N) f32; q: (K, N) int8; scales: (N,) f32.
void ffq_quantize_int8_f32(const float* w, int64_t K, int64_t N, int8_t* q,
                           float* scales) {
  std::vector<float> absmax(N, 0.f);
  // column absmax (parallel over K-chunks with per-thread partials)
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::vector<float>> partial(hw, std::vector<float>(N, 0.f));
  {
    std::vector<std::thread> threads;
    int64_t chunk = (K + hw - 1) / hw;
    for (unsigned t = 0; t < hw; ++t) {
      int64_t start = t * chunk, end = std::min<int64_t>(K, start + chunk);
      if (start >= end) break;
      threads.emplace_back([&, t, start, end]() {
        auto& p = partial[t];
        for (int64_t k = start; k < end; ++k) {
          const float* row = w + k * N;
          for (int64_t n = 0; n < N; ++n) {
            float a = std::fabs(row[n]);
            if (a > p[n]) p[n] = a;
          }
        }
      });
    }
    for (auto& th : threads) th.join();
  }
  for (auto& p : partial)
    for (int64_t n = 0; n < N; ++n)
      if (p[n] > absmax[n]) absmax[n] = p[n];
  for (int64_t n = 0; n < N; ++n)
    scales[n] = absmax[n] > 0.f ? absmax[n] / 127.0f : 1e-8f;

  parallel_for(K, [&](int64_t k0, int64_t k1) {
    for (int64_t k = k0; k < k1; ++k) {
      const float* row = w + k * N;
      int8_t* out = q + k * N;
      for (int64_t n = 0; n < N; ++n) {
        int v = static_cast<int>(std::lround(row[n] / scales[n]));
        out[n] = static_cast<int8_t>(std::clamp(v, -128, 127));
      }
    }
  });
}

}  // extern "C"
