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
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

#include <zlib.h>

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

// ------------------------------------------------------------------- png

// Big-endian u32 store (PNG integers are network order).
inline void put_be32(uint8_t* p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v >> 24);
  p[1] = static_cast<uint8_t>(v >> 16);
  p[2] = static_cast<uint8_t>(v >> 8);
  p[3] = static_cast<uint8_t>(v);
}

inline uint8_t paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
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

// Encode one image as a PNG byte stream (the serve wire format and the
// trainer's artifact dumps — PNG encode in Python costs ~25 ms/frame at
// 512px on this single-core host, docs/ROADMAP.md item 2).
//
//   bit_depth 8 : src is (H, W, C) uint8, C in {1, 3}
//   bit_depth 16: src is (H, W, C) uint16 native-endian (byte-swapped to
//                 the PNG big-endian wire order here), C in {1, 3}
//
// level is the zlib effort (0-9).  Scanlines use a fixed Paeth filter
// (type 4) — near-optimal for the smooth heightmap/texture statistics —
// and stream through one deflate state into a single IDAT whose length
// and CRC are backpatched, so peak extra memory is two filtered rows.
// Returns bytes written into out, or -1 on bad args / out_cap too small.
int64_t encode_png(const void* src, int64_t H, int64_t W, int C,
                   int bit_depth, int level, uint8_t* out, int64_t out_cap) {
  if (H <= 0 || W <= 0 || (C != 1 && C != 3) ||
      (bit_depth != 8 && bit_depth != 16) || level < 0 || level > 9 ||
      H > 0x7fffffff || W > 0x7fffffff) {
    return -1;
  }
  const int bpp = C * (bit_depth / 8);          // filter offset, bytes
  const int64_t row_bytes = W * bpp;            // one raw scanline
  static const uint8_t kSig[8] = {137, 'P', 'N', 'G', '\r', '\n', 26, '\n'};
  // sig + IHDR(25) + IDAT header(8) + ... + IDAT crc(4) + IEND(12)
  if (out_cap < 8 + 25 + 8 + 4 + 12) return -1;

  uint8_t* p = out;
  std::memcpy(p, kSig, 8);
  p += 8;

  uint8_t ihdr[13];
  put_be32(ihdr, static_cast<uint32_t>(W));
  put_be32(ihdr + 4, static_cast<uint32_t>(H));
  ihdr[8] = static_cast<uint8_t>(bit_depth);
  ihdr[9] = (C == 1) ? 0 : 2;  // grayscale / truecolor
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_be32(p, 13);
  std::memcpy(p + 4, "IHDR", 4);
  std::memcpy(p + 8, ihdr, 13);
  put_be32(p + 21, static_cast<uint32_t>(
      crc32(crc32(0L, p + 4, 4), ihdr, 13)));
  p += 25;

  // IDAT: reserve the 8-byte header now, backpatch the length at the end.
  uint8_t* idat_hdr = p;
  std::memcpy(idat_hdr + 4, "IDAT", 4);
  p += 8;
  uLong idat_crc = crc32(0L, idat_hdr + 4, 4);

  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit(&zs, level) != Z_OK) return -1;

  std::vector<uint8_t> raw_prev(row_bytes, 0), raw_cur(row_bytes),
      filt(row_bytes + 1);
  const uint8_t* sp = static_cast<const uint8_t*>(src);
  int64_t ok = 0;  // 0 while streaming, -1 on overflow
  for (int64_t r = 0; r < H && ok == 0; ++r) {
    if (bit_depth == 8) {
      std::memcpy(raw_cur.data(), sp + r * row_bytes, row_bytes);
    } else {  // u16 native -> big-endian bytes
      const uint16_t* s16 = reinterpret_cast<const uint16_t*>(sp) + r * W * C;
      for (int64_t i = 0; i < W * C; ++i) {
        raw_cur[2 * i] = static_cast<uint8_t>(s16[i] >> 8);
        raw_cur[2 * i + 1] = static_cast<uint8_t>(s16[i]);
      }
    }
    filt[0] = 4;  // Paeth
    for (int64_t i = 0; i < row_bytes; ++i) {
      const int left = (i >= bpp) ? raw_cur[i - bpp] : 0;
      const int upleft = (i >= bpp) ? raw_prev[i - bpp] : 0;
      filt[i + 1] = static_cast<uint8_t>(
          raw_cur[i] - paeth(left, raw_prev[i], upleft));
    }
    raw_cur.swap(raw_prev);

    zs.next_in = filt.data();
    zs.avail_in = static_cast<uInt>(row_bytes + 1);
    const int flush = (r == H - 1) ? Z_FINISH : Z_NO_FLUSH;
    do {
      const int64_t room = out_cap - 12 - 4 - (p - out);  // crc + IEND
      if (room <= 0) {
        ok = -1;
        break;
      }
      zs.next_out = p;
      zs.avail_out = static_cast<uInt>(
          std::min<int64_t>(room, 0x7fffffff));
      const int rc = deflate(&zs, flush);
      if (rc == Z_STREAM_ERROR) {
        ok = -1;
        break;
      }
      const int64_t produced = zs.next_out - p;
      idat_crc = crc32(idat_crc, p, static_cast<uInt>(produced));
      p += produced;
      if (rc == Z_STREAM_END) break;
    } while (zs.avail_in > 0 || zs.avail_out == 0);
  }
  deflateEnd(&zs);
  if (ok != 0) return -1;

  const int64_t idat_len = p - (idat_hdr + 8);
  if (idat_len > 0x7fffffff) return -1;
  put_be32(idat_hdr, static_cast<uint32_t>(idat_len));
  put_be32(p, static_cast<uint32_t>(idat_crc));
  p += 4;

  put_be32(p, 0);
  std::memcpy(p + 4, "IEND", 4);
  put_be32(p + 8, static_cast<uint32_t>(crc32(0L, p + 4, 4)));
  p += 12;
  return p - out;
}

int terrain_io_abi_version() { return 2; }

}  // extern "C"
