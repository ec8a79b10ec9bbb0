// fenix_tpu native host runtime: the host-side hot loops that sit
// between Arrow buffers and device transfer.
//
// Role parity: in the reference these loops live inside third-party
// native code — Arrow C++ take/filter and libtorch DataLoader workers
// (SURVEY.md §2.3). Here they are first-party: a threaded packer that
// turns Arrow FixedSizeList values into padded dense blocks, a
// threaded row gather for training-batch assembly, and a murmur-style
// hash partitioner for the distributed shuffle.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
// build image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename Fn>
void parallel_for(int64_t total, Fn fn, int64_t min_grain = 1 << 14) {
  int threads = hardware_threads();
  int64_t grain = std::max(min_grain, (total + threads - 1) / threads);
  int workers = static_cast<int>((total + grain - 1) / grain);
  if (workers <= 1) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    int64_t begin = w * grain;
    int64_t end = std::min(total, begin + grain);
    pool.emplace_back([=] { fn(begin, end); });
  }
  for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// Pack `rows`×`width` source bytes into a `rows_pad`×`width` dense
// block, zero-filling the tail. width = dim * sizeof(dtype).
void fenix_pack_rows(const uint8_t* src, uint8_t* dst, int64_t rows,
                     int64_t rows_pad, int64_t width, int32_t fill_byte) {
  parallel_for(rows, [&](int64_t b, int64_t e) {
    std::memcpy(dst + b * width, src + b * width, (e - b) * width);
  });
  if (rows_pad > rows) {
    std::memset(dst + rows * width, fill_byte, (rows_pad - rows) * width);
  }
}

// Gather rows by int64 indices: dst[i] = src[idx[i]].
void fenix_gather_rows(const uint8_t* src, const int64_t* idx, uint8_t* dst,
                       int64_t n_idx, int64_t width) {
  parallel_for(n_idx, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      std::memcpy(dst + i * width, src + idx[i] * width, width);
    }
  }, 1 << 10);
}

// murmur3 finalizer — must match fenix_tpu.ops.relational.hash_partition
// (same avalanche over the low 32 bits of the key).
static inline uint32_t mix32(uint32_t x) {
  x = (x ^ (x >> 16)) * 0x85EBCA6Bu;
  x = (x ^ (x >> 13)) * 0xC2B2AE35u;
  return x ^ (x >> 16);
}

// Partition ids for each key + per-partition counts (counts has
// num_partitions entries, zero-initialized by the caller).
// Fused row scorer: out[i] = dot(rows[pos[i]], query) * mul[pos[i]] +
// add[pos[i]]. The residency host paths previously gathered the rows
// into a dense block and ran a BLAS dot — 3-4x the memory traffic of
// reading each row once (int8 additionally paid an fp32 materialize of
// the whole probed set). One threaded pass, rows touched exactly once.
void fenix_row_score_f32(const float* rows, const int64_t* pos,
                         const float* query, const float* mul,
                         const float* add, float* out, int64_t n,
                         int64_t dim) {
  parallel_for(
      n,
      [&](int64_t b, int64_t e) {
        for (int64_t i = b; i < e; ++i) {
          const float* row = rows + pos[i] * dim;
          float acc = 0.f;
          for (int64_t j = 0; j < dim; ++j) acc += row[j] * query[j];
          out[i] = acc * mul[pos[i]] + add[pos[i]];
        }
      },
      /*min_grain=*/int64_t{1} << 11);
}

void fenix_row_score_int8(const int8_t* rows, const int64_t* pos,
                          const float* query, const float* mul,
                          const float* add, float* out, int64_t n,
                          int64_t dim) {
  parallel_for(
      n,
      [&](int64_t b, int64_t e) {
        for (int64_t i = b; i < e; ++i) {
          const int8_t* row = rows + pos[i] * dim;
          float acc = 0.f;
          for (int64_t j = 0; j < dim; ++j)
            acc += static_cast<float>(row[j]) * query[j];
          out[i] = acc * mul[pos[i]] + add[pos[i]];
        }
      },
      /*min_grain=*/int64_t{1} << 11);
}

void fenix_hash_partition(const int64_t* keys, int32_t* parts, int64_t n,
                          int32_t num_partitions, int64_t* counts) {
  std::vector<std::atomic<int64_t>> local(num_partitions);
  for (auto& c : local) c.store(0, std::memory_order_relaxed);
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint32_t h = mix32(static_cast<uint32_t>(keys[i]));
      int32_t p = static_cast<int32_t>(h % static_cast<uint32_t>(num_partitions));
      parts[i] = p;
      local[p].fetch_add(1, std::memory_order_relaxed);
    }
  });
  for (int32_t p = 0; p < num_partitions; ++p) {
    counts[p] += local[p].load(std::memory_order_relaxed);
  }
}

// Stable scatter of rows into per-partition output regions.
// offsets[p] = start row of partition p in dst (exclusive prefix sum of
// counts); after the call offsets is unchanged (scratch copied inside).
void fenix_partition_scatter(const uint8_t* src, const int32_t* parts,
                             const int64_t* offsets, uint8_t* dst, int64_t n,
                             int64_t width, int32_t num_partitions) {
  std::vector<int64_t> cursor(offsets, offsets + num_partitions);
  // stable: single-threaded scatter (order within partition preserved)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(dst + cursor[parts[i]]++ * width, src + i * width, width);
  }
}

int32_t fenix_version() { return 1; }

}  // extern "C"
