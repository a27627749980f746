// nf4core — native NF4 codec for the streaming checkpoint converter.
//
// The converter's CPU hot loop (nibble repack, absmax double-dequant, and
// the validation-path full dequant) in multithreaded C++, exposed through a
// plain C ABI consumed via ctypes (gpt_oss_vllm_tpu/native/__init__.py).
// This is the TPU-framework counterpart of the native codecs the reference
// borrows from bitsandbytes' CUDA build (SURVEY.md §2.3 row 3) — here it
// serves the offline conversion/IO path; on-device dequant lives in the
// Pallas kernels.
//
// Build: native/build.sh  (g++ -O3 -shared; no external deps).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxThreads = 16;

template <typename F>
void parallel_for(int64_t n, F&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = static_cast<int>(std::min<uint64_t>(
      std::min<uint64_t>(hw ? hw : 1, kMaxThreads), (n + (1 << 16) - 1) >> 16));
  if (nthreads <= 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Swap low/high nibbles of every byte (normalizes "high_first" checkpoints
// into the engine's low-first layout). In place.
void nf4_swap_nibbles(uint8_t* data, int64_t n_bytes) {
  parallel_for(n_bytes, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint8_t b = data[i];
      data[i] = static_cast<uint8_t>(((b & 0x0F) << 4) | (b >> 4));
    }
  });
}

// Blockwise NF4 dequantization, low-nibble-first flat order.
// packed: n/2 bytes; absmax: n/blocksize floats; code: 16 floats; out: n floats.
void nf4_dequant(const uint8_t* packed, const float* absmax, const float* code,
                 float* out, int64_t n, int64_t blocksize) {
  int64_t n_blocks = n / blocksize;
  parallel_for(n_blocks, [&](int64_t blo, int64_t bhi) {
    for (int64_t b = blo; b < bhi; ++b) {
      float s = absmax[b];
      int64_t base = b * blocksize;
      const uint8_t* p = packed + base / 2;
      float* o = out + base;
      for (int64_t j = 0; j < blocksize / 2; ++j) {
        uint8_t byte = p[j];
        o[2 * j] = code[byte & 0x0F] * s;
        o[2 * j + 1] = code[byte >> 4] * s;
      }
    }
  });
}

// Blockwise NF4 quantization (nearest codeword; code must be sorted asc).
// w: n floats; packed: n/2 bytes out; absmax: n/blocksize floats out.
void nf4_quant(const float* w, const float* code, uint8_t* packed,
               float* absmax, int64_t n, int64_t blocksize) {
  float mid[15];
  for (int i = 0; i < 15; ++i) mid[i] = 0.5f * (code[i] + code[i + 1]);
  int64_t n_blocks = n / blocksize;
  parallel_for(n_blocks, [&](int64_t blo, int64_t bhi) {
    for (int64_t b = blo; b < bhi; ++b) {
      int64_t base = b * blocksize;
      float amax = 0.f;
      for (int64_t j = 0; j < blocksize; ++j)
        amax = std::max(amax, std::fabs(w[base + j]));
      absmax[b] = amax;
      float inv = amax > 0.f ? 1.0f / amax : 1.0f;
      uint8_t* p = packed + base / 2;
      for (int64_t j = 0; j < blocksize / 2; ++j) {
        float v0 = w[base + 2 * j] * inv;
        float v1 = w[base + 2 * j + 1] * inv;
        uint8_t i0 = static_cast<uint8_t>(std::upper_bound(mid, mid + 15, v0) - mid);
        uint8_t i1 = static_cast<uint8_t>(std::upper_bound(mid, mid + 15, v1) - mid);
        p[j] = static_cast<uint8_t>(i0 | (i1 << 4));
      }
    }
  });
}

// Double-quantized absmax recovery: out[i] = code256[q[i]] * nested_absmax[i / nb] + offset
void nf4_dequant_absmax(const uint8_t* q, const float* nested_absmax,
                        const float* code256, float offset, float* out,
                        int64_t n, int64_t nested_blocksize, int64_t n_nested) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t blk = nested_blocksize > 0 ? i / nested_blocksize : 0;
      if (blk >= n_nested) blk = n_nested - 1;
      out[i] = code256[q[i]] * nested_absmax[blk] + offset;
    }
  });
}

int nf4core_abi_version() { return 1; }

}  // extern "C"
