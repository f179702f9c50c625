// chunkio: native (C++) chunk codec for the zarrlite data plane.
//
// The reference framework's survey stores are Blosc-compressed zarr v2
// directories (reference pipeline_train_predict/save_predict.py:124-134
// writes Blosc zstd-3 BITSHUFFLE; the xarray-written _sv/_labels/_bottom
// triplets opened at data_reader.py:516-575 default to Blosc).  This
// library gives the Python data plane a GIL-free, multi-threaded
// decompress/compress path on top of the system libblosc: one call decodes
// a whole slab's worth of chunks in parallel into caller-provided
// destinations.
//
// Exposed C ABI (consumed via ctypes from
// crimac_unet_tpu/data/blosc_codec.py):
//   cio_version()                 -> libblosc version string
//   cio_decompress(...)           -> one buffer
//   cio_compress(...)             -> one buffer
//   cio_batch_decompress(...)     -> N buffers, std::thread fan-out
//
// Build: make -C crimac_unet_tpu/native   (g++ -O3 -shared -fPIC, links
// -lblosc -lpthread).  Python builds it on demand and falls back to plain
// ctypes-on-libblosc, then to a pure-numpy decoder, when unavailable.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

// libblosc 1.x C ABI (the system ships libblosc.so.1 without headers;
// these signatures are the stable public API of c-blosc 1.x).
extern "C" {
const char* blosc_get_version_string(void);
void blosc_cbuffer_sizes(const void* cbuffer, size_t* nbytes, size_t* cbytes,
                         size_t* blocksize);
int blosc_decompress_ctx(const void* src, void* dest, size_t destsize,
                         int numinternalthreads);
int blosc_compress_ctx(int clevel, int doshuffle, size_t typesize,
                       size_t nbytes, const void* src, void* dest,
                       size_t destsize, const char* compressor,
                       size_t blocksize, int numinternalthreads);
}
#define BLOSC_MIN_HEADER_LENGTH 16

extern "C" {

const char* cio_version() { return blosc_get_version_string(); }

// Decompress one blosc frame. Returns decompressed byte count or <0 on
// error (mirrors blosc_decompress_ctx).
int64_t cio_decompress(const void* src, int64_t src_size, void* dst,
                       int64_t dst_size) {
  if (src_size < BLOSC_MIN_HEADER_LENGTH) return -1;
  size_t nbytes = 0, cbytes = 0, blocksize = 0;
  blosc_cbuffer_sizes(src, &nbytes, &cbytes, &blocksize);
  if ((int64_t)cbytes > src_size || (int64_t)nbytes > dst_size) return -2;
  return blosc_decompress_ctx(src, dst, dst_size, /*numinternalthreads=*/1);
}

// Compress one buffer. Returns compressed byte count, 0 if dst too small,
// <0 on error.
int64_t cio_compress(int clevel, int shuffle, int64_t typesize,
                     const void* src, int64_t src_size, void* dst,
                     int64_t dst_size, const char* cname, int nthreads) {
  return blosc_compress_ctx(clevel, shuffle, (size_t)typesize,
                            (size_t)src_size, src, dst, (size_t)dst_size,
                            cname, /*blocksize=*/0, nthreads);
}

// Decompress n frames in parallel (one std::thread per hardware thread,
// work-stealing over an atomic counter).  srcs/dsts are arrays of
// pointers; results[i] receives the per-frame return code.  Returns 0 when
// every frame decoded, else the count of failed frames.
int64_t cio_batch_decompress(int64_t n, const void* const* srcs,
                             const int64_t* src_sizes, void* const* dsts,
                             const int64_t* dst_sizes, int64_t* results,
                             int max_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failed(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      int64_t rc = cio_decompress(srcs[i], src_sizes[i], dsts[i],
                                  dst_sizes[i]);
      if (results) results[i] = rc;
      if (rc < 0) failed.fetch_add(1);
    }
  };
  int hw = (int)std::thread::hardware_concurrency();
  if (hw <= 0) hw = 4;
  if (max_threads > 0 && max_threads < hw) hw = max_threads;
  if ((int64_t)hw > n) hw = (int)n;
  if (hw <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(hw);
    for (int t = 0; t < hw; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failed.load();
}

}  // extern "C"
