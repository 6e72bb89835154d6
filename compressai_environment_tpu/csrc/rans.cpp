// Fast host-side range-ANS codec for the TPU-native compression framework.
//
// Implements the same bitstream format as the executable Python spec in
// ../entropy/rans.py (64-bit ryg-style rANS, 16-bit probability precision,
// 4-bit bypass escapes, reverse-order encode, backwards-written stream,
// 2x32-bit little-endian flush) — see that file for the normative format
// description and the reference citations.
//
// Design differences from the reference CompressAI pybind11 extension
// (compressai/cpp_exts/rans/rans_interface.cpp), rebuilt here for throughput:
//   * C ABI over flat arrays (ctypes-friendly, zero per-call list conversion;
//     the reference converts tensors to Python lists per batch element —
//     entropy_models.py:258-267 — which dominates its encode time),
//   * CDF tables are one contiguous (ncdfs, stride) int32 matrix, exactly the
//     padded layout our entropy models keep on device,
//   * decode uses branchless binary search over the CDF row instead of a
//     linear std::find_if scan,
//   * batched multi-stream entry points parallelized with OpenMP: each image
//     (or latent tile / lane) is an independent stream.
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC -fopenmp rans.cpp -o librans.so

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr uint32_t kPrecision = 16;
constexpr uint32_t kBypassBits = 4;
constexpr uint32_t kMaxBypass = (1u << kBypassBits) - 1;
constexpr uint64_t kRansL = 1ull << 31;

struct SymRec {
  uint16_t start;  // cdf start, or raw nibble value in bypass mode
  uint16_t freq;   // frequency; unused in bypass mode
  bool bypass;
};

// Expand (symbol, index) pairs into coder records (escape folding + bypass
// nibbles). Forward pass; flush() replays in reverse.
inline void build_records(const int32_t* symbols, const int32_t* indexes,
                          int64_t n, const int32_t* cdfs, int64_t stride,
                          const int32_t* cdf_sizes, const int32_t* offsets,
                          std::vector<SymRec>& out) {
  out.reserve(out.size() + static_cast<size_t>(n) + 16);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * stride;
    const int32_t max_value = cdf_sizes[idx] - 2;
    int32_t value = symbols[i] - offsets[idx];

    uint32_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint32_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (value - max_value));
      value = max_value;
    }

    out.push_back({static_cast<uint16_t>(cdf[value]),
                   static_cast<uint16_t>(cdf[value + 1] - cdf[value]), false});

    if (value == max_value) {
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassBits)) != 0) ++n_bypass;

      int32_t val = n_bypass;
      while (val >= static_cast<int32_t>(kMaxBypass)) {
        out.push_back({static_cast<uint16_t>(kMaxBypass), 0, true});
        val -= kMaxBypass;
      }
      out.push_back({static_cast<uint16_t>(val), 0, true});

      for (int32_t j = 0; j < n_bypass; ++j) {
        const uint16_t nib = (raw_val >> (j * kBypassBits)) & kMaxBypass;
        out.push_back({nib, 0, true});
      }
    }
  }
}

// Replay records in reverse through the rANS state, writing the stream
// backwards into out[0..cap). Returns the byte offset of the stream start
// within out (stream occupies [off, cap)), or -1 if the buffer is too small.
inline int64_t flush_records(const std::vector<SymRec>& recs, uint8_t* out,
                             int64_t cap) {
  uint64_t x = kRansL;
  uint32_t* base = reinterpret_cast<uint32_t*>(out);
  int64_t nwords = cap / 4;
  int64_t w = nwords;  // next write position - 1 (we write at --w)

  for (auto it = recs.rbegin(); it != recs.rend(); ++it) {
    if (!it->bypass) {
      const uint32_t freq = it->freq;
      const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
      if (x >= x_max) {
        if (w == 0) return -1;
        base[--w] = static_cast<uint32_t>(x);
        x >>= 32;
      }
      x = ((x / freq) << kPrecision) + (x % freq) + it->start;
    } else {
      const uint64_t x_max =
          ((kRansL >> kPrecision) << 32) * (1ull << (kPrecision - kBypassBits));
      if (x >= x_max) {
        if (w == 0) return -1;
        base[--w] = static_cast<uint32_t>(x);
        x >>= 32;
      }
      x = (x << kBypassBits) | it->start;
    }
  }

  if (w < 2) return -1;
  base[--w] = static_cast<uint32_t>(x >> 32);
  base[--w] = static_cast<uint32_t>(x);
  return w * 4;
}

struct DecState {
  uint64_t x;
  const uint32_t* ptr;
  const uint32_t* end;

  void init(const uint8_t* stream) {
    ptr = reinterpret_cast<const uint32_t*>(stream);
    x = static_cast<uint64_t>(ptr[0]) | (static_cast<uint64_t>(ptr[1]) << 32);
    ptr += 2;
  }

  inline void renorm() {
    if (x < kRansL) {
      x = (x << 32) | *ptr++;
    }
  }

  inline uint32_t get_bits(uint32_t nbits) {
    const uint32_t val = static_cast<uint32_t>(x) & ((1u << nbits) - 1);
    x >>= nbits;
    renorm();
    return val;
  }
};

// Decode n symbols from a stream given per-symbol CDF indexes.
inline void decode_symbols(DecState& st, const int32_t* indexes, int64_t n,
                           const int32_t* cdfs, int64_t stride,
                           const int32_t* cdf_sizes, const int32_t* offsets,
                           int32_t* out) {
  constexpr uint32_t mask = (1u << kPrecision) - 1;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + idx * stride;
    const int32_t size = cdf_sizes[idx];
    const int32_t max_value = size - 2;

    const uint32_t cum = static_cast<uint32_t>(st.x) & mask;

    // Binary search: largest s with cdf[s] <= cum (cdf strictly increasing,
    // cdf[0]=0, cdf[size-1]=1<<precision, cum < 1<<precision).
    int32_t lo = 0, hi = size - 1;  // invariant: cdf[lo] <= cum < cdf[hi]
    while (hi - lo > 1) {
      const int32_t mid = (lo + hi) >> 1;
      if (static_cast<uint32_t>(cdf[mid]) <= cum)
        lo = mid;
      else
        hi = mid;
    }
    const int32_t s = lo;
    const uint32_t start = static_cast<uint32_t>(cdf[s]);
    const uint32_t freq = static_cast<uint32_t>(cdf[s + 1]) - start;

    st.x = freq * (st.x >> kPrecision) + cum - start;
    st.renorm();

    int32_t value = s;
    if (value == max_value) {
      uint32_t val = st.get_bits(kBypassBits);
      uint32_t n_bypass = val;
      while (val == kMaxBypass) {
        val = st.get_bits(kBypassBits);
        n_bypass += val;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_bypass; ++j) {
        raw_val |= st.get_bits(kBypassBits) << (j * kBypassBits);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1)
        value = -value - 1;
      else
        value += max_value;
    }

    out[i] = value + offsets[idx];
  }
}

}  // namespace

// Validated (debug) build: compile with -DRANS_VALIDATE (the framework's
// analogue of the reference's DEBUG_BUILD=1, setup.py:72-73 + the asserts at
// rans_interface.cpp:56-66). Checks every referenced CDF row: cdf[0] == 0,
// strictly increasing, final value == 1 << precision; and every index in
// range. Entry points return -3 on invalid tables instead of corrupting
// streams.
#ifdef RANS_VALIDATE
static bool cdfs_valid(const int32_t* indexes, int64_t n, const int32_t* cdfs,
                       int64_t stride, const int32_t* cdf_sizes,
                       int64_t /*ncdfs_hint*/) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t row = indexes[i];
    if (row < 0) return false;
    const int32_t size = cdf_sizes[row];
    if (size < 2 || size > stride) return false;
    const int32_t* c = cdfs + row * stride;
    if (c[0] != 0 || c[size - 1] != (1 << kPrecision)) return false;
    for (int32_t j = 0; j + 1 < size; ++j)
      if (c[j + 1] <= c[j]) return false;
  }
  return true;
}
#define RANS_CHECK(cond) do { if (!(cond)) return -3; } while (0)
#else
#define RANS_CHECK(cond) do { } while (0)
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Single-stream API
// ---------------------------------------------------------------------------

// Encode n symbols; writes the stream right-aligned into out[0..cap).
// Returns the byte offset where the stream starts, -1 on overflow, or -3 on
// invalid tables (validated build only).
int64_t rans_encode(const int32_t* symbols, const int32_t* indexes, int64_t n,
                    const int32_t* cdfs, int64_t stride,
                    const int32_t* cdf_sizes, const int32_t* offsets,
                    uint8_t* out, int64_t cap) {
  RANS_CHECK(cdfs_valid(indexes, n, cdfs, stride, cdf_sizes, 0));
  std::vector<SymRec> recs;
  build_records(symbols, indexes, n, cdfs, stride, cdf_sizes, offsets, recs);
  return flush_records(recs, out, cap);
}

int64_t rans_decode(const uint8_t* stream, const int32_t* indexes, int64_t n,
                    const int32_t* cdfs, int64_t stride,
                    const int32_t* cdf_sizes, const int32_t* offsets,
                    int32_t* out) {
  RANS_CHECK(cdfs_valid(indexes, n, cdfs, stride, cdf_sizes, 0));
  DecState st;
  st.init(stream);
  decode_symbols(st, indexes, n, cdfs, stride, cdf_sizes, offsets, out);
  return 0;
}

// ---------------------------------------------------------------------------
// Batched multi-stream API (one independent stream per batch element)
// ---------------------------------------------------------------------------

// symbols/indexes: (batch, n) row-major. Each stream is encoded into its own
// cap-byte slot of out (batch, cap); per-stream start offsets are written to
// starts[b] (stream b occupies out[b*cap + starts[b] .. (b+1)*cap)).
// Returns 0, or -1 if any stream overflowed its slot.
int64_t rans_encode_batch(const int32_t* symbols, const int32_t* indexes,
                          int64_t batch, int64_t n, const int32_t* cdfs,
                          int64_t stride, const int32_t* cdf_sizes,
                          const int32_t* offsets, uint8_t* out, int64_t cap,
                          int64_t* starts) {
  RANS_CHECK(cdfs_valid(indexes, batch * n, cdfs, stride, cdf_sizes, 0));
  int64_t err = 0;
#pragma omp parallel for schedule(dynamic)
  for (int64_t b = 0; b < batch; ++b) {
    std::vector<SymRec> recs;
    build_records(symbols + b * n, indexes + b * n, n, cdfs, stride, cdf_sizes,
                  offsets, recs);
    const int64_t off = flush_records(recs, out + b * cap, cap);
    starts[b] = off;
    if (off < 0) {
#pragma omp atomic write
      err = -1;
    }
  }
  return err;
}

// streams: concatenated buffer; stream b starts at stream_offsets[b].
int64_t rans_decode_batch(const uint8_t* streams, const int64_t* stream_offsets,
                          const int32_t* indexes, int64_t batch, int64_t n,
                          const int32_t* cdfs, int64_t stride,
                          const int32_t* cdf_sizes, const int32_t* offsets,
                          int32_t* out) {
  RANS_CHECK(cdfs_valid(indexes, batch * n, cdfs, stride, cdf_sizes, 0));
#pragma omp parallel for schedule(dynamic)
  for (int64_t b = 0; b < batch; ++b) {
    DecState st;
    st.init(streams + stream_offsets[b]);
    decode_symbols(st, indexes + b * n, n, cdfs, stride, cdf_sizes, offsets,
                   out + b * n);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Incremental (streaming) API — autoregressive decode
// ---------------------------------------------------------------------------

struct RansDecHandle {
  std::vector<uint8_t> buf;
  DecState st;
};

void* rans_dec_new(const uint8_t* stream, int64_t nbytes) {
  auto* h = new RansDecHandle();
  h->buf.assign(stream, stream + nbytes);
  h->st.init(h->buf.data());
  return h;
}

void rans_dec_free(void* handle) { delete static_cast<RansDecHandle*>(handle); }

void rans_dec_decode(void* handle, const int32_t* indexes, int64_t n,
                     const int32_t* cdfs, int64_t stride,
                     const int32_t* cdf_sizes, const int32_t* offsets,
                     int32_t* out) {
  auto* h = static_cast<RansDecHandle*>(handle);
  decode_symbols(h->st, indexes, n, cdfs, stride, cdf_sizes, offsets, out);
}

// ---------------------------------------------------------------------------
// Incremental (buffered) encoder handle — autoregressive encode
// ---------------------------------------------------------------------------

struct RansEncHandle {
  std::vector<SymRec> recs;
};

void* rans_enc_new() { return new RansEncHandle(); }

void rans_enc_free(void* handle) { delete static_cast<RansEncHandle*>(handle); }

void rans_enc_put(void* handle, const int32_t* symbols, const int32_t* indexes,
                  int64_t n, const int32_t* cdfs, int64_t stride,
                  const int32_t* cdf_sizes, const int32_t* offsets) {
  auto* h = static_cast<RansEncHandle*>(handle);
  build_records(symbols, indexes, n, cdfs, stride, cdf_sizes, offsets, h->recs);
}

int64_t rans_enc_flush(void* handle, uint8_t* out, int64_t cap) {
  auto* h = static_cast<RansEncHandle*>(handle);
  const int64_t off = flush_records(h->recs, out, cap);
  h->recs.clear();
  return off;
}

}  // extern "C"
