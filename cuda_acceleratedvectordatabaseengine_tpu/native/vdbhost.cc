// Native host runtime for the TPU vector DB engine.
//
// The TPU-side analog of the reference's C++ host runtime
// (engine/transfer_manager.cpp pools + staging, engine/prefetcher.cpp IO):
// TPUs expose no user-visible streams or pinned pools, so what remains
// host-critical is (a) assembling padded staging blocks for HBM uploads of
// cache-missed inverted lists, (b) gathering candidate rows for reranks,
// and (c) storage readahead — all multithreaded C++ below, free of the
// Python GIL (callers use ctypes with release-GIL semantics).
//
// Build: make -C cuda_acceleratedvectordatabaseengine_tpu/native
// API is extern "C" + raw pointers so ctypes/cffi bind without pybind11.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// Simple parallel-for over [0, n) with hardware-concurrency workers.
template <typename F>
void parallel_for(int64_t n, F&& fn, int max_threads = 0) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = max_threads > 0 ? max_threads : (hw > 0 ? hw : 4);
  if (n < 2 || nt < 2) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  if (nt > n) nt = static_cast<int>(n);
  std::atomic<int64_t> next(0);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1, std::memory_order_relaxed);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// 64-byte-aligned allocation (cache-line / vector friendly), the host-pool
// role of the reference's PinnedMemoryPool (transfer_manager.cpp:12-86).
void* vdb_aligned_alloc(size_t bytes) {
  void* p = nullptr;
  if (posix_memalign(&p, 64, bytes) != 0) return nullptr;
  return p;
}

void vdb_aligned_free(void* p) { free(p); }

// Assemble a padded staging block for an HBM upload of `n_lists` inverted
// lists: out[i, 0:counts[i], :] = lists[i], zero padding above, plus fp32
// squared norms. `list_ptrs[i]` points at counts[i]*dim contiguous floats.
// Parallel over lists; memcpy per list row-block.
void vdb_gather_lists(const float** list_ptrs, const int32_t* counts,
                      int32_t n_lists, int32_t cap, int32_t dim,
                      float* out_vectors, float* out_sq) {
  const int64_t row_bytes = static_cast<int64_t>(dim) * sizeof(float);
  parallel_for(n_lists, [&](int64_t i) {
    const float* src = list_ptrs[i];
    const int32_t c = counts[i] < cap ? counts[i] : cap;
    float* dst = out_vectors + i * static_cast<int64_t>(cap) * dim;
    float* sq = out_sq + i * static_cast<int64_t>(cap);
    std::memcpy(dst, src, static_cast<size_t>(c) * row_bytes);
    std::memset(dst + static_cast<int64_t>(c) * dim, 0,
                static_cast<size_t>(cap - c) * row_bytes);
    for (int32_t r = 0; r < c; ++r) {
      const float* row = src + static_cast<int64_t>(r) * dim;
      float acc = 0.f;
      for (int32_t d = 0; d < dim; ++d) acc += row[d] * row[d];
      sq[r] = acc;
    }
    std::memset(sq + c, 0, static_cast<size_t>(cap - c) * sizeof(float));
  });
}

// Gather rows by index: out[i, :] = src[rows[i], :]; rows[i] < 0 zero-fills.
// Backs host-side candidate fetch (rerank) and snapshot repacking.
void vdb_gather_rows(const float* src, int64_t src_rows, int32_t dim,
                     const int64_t* rows, int64_t n, float* out) {
  const int64_t row_bytes = static_cast<int64_t>(dim) * sizeof(float);
  parallel_for(n, [&](int64_t i) {
    const int64_t r = rows[i];
    float* dst = out + i * static_cast<int64_t>(dim);
    if (r < 0 || r >= src_rows) {
      std::memset(dst, 0, static_cast<size_t>(row_bytes));
    } else {
      std::memcpy(dst, src + r * static_cast<int64_t>(dim),
                  static_cast<size_t>(row_bytes));
    }
  });
}

// fp32 → bf16 (round-to-nearest-even) conversion, parallel. Staging blocks
// upload in the corpus dtype, halving H2D bytes.
void vdb_f32_to_bf16(const float* src, int64_t n, uint16_t* out) {
  parallel_for((n + (1 << 20) - 1) >> 20, [&](int64_t blk) {
    const int64_t lo = blk << 20;
    const int64_t hi = lo + (1 << 20) < n ? lo + (1 << 20) : n;
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t bits;
      std::memcpy(&bits, &src[i], 4);
      const uint32_t rounding = 0x7FFF + ((bits >> 16) & 1);
      out[i] = static_cast<uint16_t>((bits + rounding) >> 16);
    }
  });
}

// Storage readahead: fadvise(WILLNEED) + optional synchronous pread warm of
// the first `touch_bytes` (the NVMeOptimizedReader role, storage.h:91-122).
int32_t vdb_readahead(const char* path, int64_t offset, int64_t length,
                      int64_t touch_bytes) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
#ifdef POSIX_FADV_WILLNEED
  posix_fadvise(fd, offset, length, POSIX_FADV_WILLNEED);
#endif
  int32_t rc = 0;
  if (touch_bytes > 0) {
    const int64_t chunk = 1 << 20;
    std::vector<char> buf(static_cast<size_t>(chunk));
    int64_t done = 0;
    while (done < touch_bytes) {
      int64_t want = touch_bytes - done < chunk ? touch_bytes - done : chunk;
      ssize_t got = pread(fd, buf.data(), static_cast<size_t>(want),
                          offset + done);
      if (got <= 0) { rc = -2; break; }
      done += got;
    }
  }
  close(fd);
  return rc;
}

int32_t vdb_hardware_concurrency() {
  return static_cast<int32_t>(std::thread::hardware_concurrency());
}

}  // extern "C"
