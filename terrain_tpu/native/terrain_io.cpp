// terrain_io — native host-side data-path kernels for terrain_tpu.
//
// The reference delegated all native work to Theano's runtime codegen
// (SURVEY.md §2: no in-repo C++/CUDA); here the TPU feeds from the host, so
// the host-side inner loops — crop gather from the 21600x10800 NASA rasters,
// uint8->float32 normalization, and the ocean filter
// (notebooks/prototype_cropping_code.ipynb cell 11) — are C++ with a plain C
// ABI consumed via ctypes (terrain_tpu/data/native.py), with a NumPy
// fallback when the shared library is not built.
//
// Build: make -C terrain_tpu/native   (g++ -O3 -shared -fPIC -pthread)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// Run fn(i) for i in [0, n) over up to n_threads workers.
template <typename F>
void parallel_for(int64_t n, int n_threads, F fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  int workers = static_cast<int>(std::min<int64_t>(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([=]() {
      for (int64_t i = t; i < n; i += workers) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Gather n (crop x crop x C) windows from a (H x W x C) uint8 raster at
// offsets (ys[i], xs[i]) into out[n][crop][crop][C].  Offsets must satisfy
// 0 <= y <= H-crop, 0 <= x <= W-crop (caller-checked).
void crop_batch_u8(const uint8_t* src, int64_t H, int64_t W, int64_t C,
                   const int64_t* ys, const int64_t* xs, int64_t n,
                   int64_t crop, uint8_t* out, int n_threads) {
  const int64_t row_bytes = crop * C;
  const int64_t crop_bytes = crop * row_bytes;
  parallel_for(n, n_threads, [=](int64_t i) {
    const int64_t y0 = ys[i], x0 = xs[i];
    uint8_t* dst = out + i * crop_bytes;
    for (int64_t r = 0; r < crop; ++r) {
      std::memcpy(dst + r * row_bytes,
                  src + ((y0 + r) * W + x0) * C, row_bytes);
    }
  });
}

// uint8 -> float32 normalization over n elements:
//   gray != 0 : x / 255            (heightmaps, [0,1], util.py:34)
//   gray == 0 : (x - 127.5)/127.5  (textures, [-1,1], util.py:35)
void normalize_u8_f32(const uint8_t* src, int64_t n, int gray, float* out,
                      int n_threads) {
  const int64_t chunk = 1 << 20;
  const int64_t n_chunks = (n + chunk - 1) / chunk;
  parallel_for(n_chunks, n_threads, [=](int64_t c) {
    const int64_t lo = c * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (gray) {
      constexpr float k = 1.0f / 255.0f;
      for (int64_t i = lo; i < hi; ++i) out[i] = src[i] * k;
    } else {
      constexpr float k = 1.0f / 127.5f;
      for (int64_t i = lo; i < hi; ++i) out[i] = src[i] * k - 1.0f;
    }
  });
}

// Fraction of zero bytes in each of n consecutive blocks of crop_elems —
// the ocean comparator (keep iff fraction <= 0.9), cell 11 of the notebook.
void zero_fraction(const uint8_t* src, int64_t n, int64_t crop_elems,
                   float* out, int n_threads) {
  parallel_for(n, n_threads, [=](int64_t i) {
    const uint8_t* p = src + i * crop_elems;
    int64_t zeros = 0;
    for (int64_t j = 0; j < crop_elems; ++j) zeros += (p[j] == 0);
    out[i] = static_cast<float>(zeros) / static_cast<float>(crop_elems);
  });
}

int terrain_io_abi_version() { return 1; }

}  // extern "C"
