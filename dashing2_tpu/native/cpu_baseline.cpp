// Measured CPU baselines for the register-comparison and sketch phases.
//
// Reproduces, with our own AVX-512 implementations, the per-pair SIMD
// kernel semantics the reference dispatches per register width
// (/root/reference/src/cmp_core.cpp:372-517: sketch::eq::count_eq /
// count_gtlt / *_nibbles over m registers for u8/u16/u32/u64/f64 and
// packed nibbles), and the per-base encode+hash+OPH-update loop of its
// sketch phase (/root/reference/src/fastxsketch.cpp:383-424: 2-bit
// encode, RC-canonical min, Wang-hash scramble, bucketed min update).
// The reference's own `sketch` submodule is empty in this checkout
// (/root/reference/.gitmodules), so these stand in for "the reference
// compiled here": mask-register compares + mask popcounts are the
// optimal formulation of count_eq/count_gtlt on AVX-512BW hardware,
// giving the CPU side its best case.
//
// Output: one JSON object per line per mode:
//   {"mode": "...", "value": pairs_per_sec_or_bases_per_sec,
//    "threads": T, "projected_32t": 32/T*value}
// The 32-thread projection assumes linear scaling (these kernels are
// cache-resident and embarrassingly parallel over pairs — the
// reference runs them under OMP_PFOR_DYN), which is the most favorable
// assumption for the CPU.
//
// Build: g++ -O3 -march=native -std=c++17 cpu_baseline.cpp -o cpu_baseline

#include <immintrin.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

namespace {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;

// ---------------------------------------------------------------- count_eq
u64 count_eq_u8(const u8* a, const u8* b, size_t m) {
  u64 c = 0;
  size_t i = 0;
  for (; i + 64 <= m; i += 64) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    c += _mm_popcnt_u64(_mm512_cmpeq_epi8_mask(va, vb));
  }
  for (; i < m; ++i) c += a[i] == b[i];
  return c;
}

u64 count_eq_u16(const u16* a, const u16* b, size_t m) {
  u64 c = 0;
  size_t i = 0;
  for (; i + 32 <= m; i += 32) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    c += _mm_popcnt_u32(_mm512_cmpeq_epi16_mask(va, vb));
  }
  for (; i < m; ++i) c += a[i] == b[i];
  return c;
}

u64 count_eq_u32(const u32* a, const u32* b, size_t m) {
  u64 c = 0;
  size_t i = 0;
  for (; i + 16 <= m; i += 16) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    c += _mm_popcnt_u32(_mm512_cmpeq_epi32_mask(va, vb));
  }
  for (; i < m; ++i) c += a[i] == b[i];
  return c;
}

u64 count_eq_u64(const u64* a, const u64* b, size_t m) {
  u64 c = 0;
  size_t i = 0;
  for (; i + 8 <= m; i += 8) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    c += _mm_popcnt_u32(_mm512_cmpeq_epi64_mask(va, vb));
  }
  for (; i < m; ++i) c += a[i] == b[i];
  return c;
}

// nibble-packed: two registers per byte, m = register count
u64 count_eq_nib(const u8* a, const u8* b, size_t m) {
  const size_t nb = m / 2;
  u64 c = 0;
  size_t i = 0;
  const __m512i lo = _mm512_set1_epi8(0x0F);
  for (; i + 64 <= nb; i += 64) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    __m512i x = _mm512_xor_si512(va, vb);
    c += _mm_popcnt_u64(
        _mm512_cmpeq_epi8_mask(_mm512_and_si512(x, lo), _mm512_setzero_si512()));
    c += _mm_popcnt_u64(_mm512_cmpeq_epi8_mask(
        _mm512_andnot_si512(lo, x), _mm512_setzero_si512()));
  }
  for (; i < nb; ++i) {
    u8 x = a[i] ^ b[i];
    c += (x & 0x0F) == 0;
    c += (x & 0xF0) == 0;
  }
  return c;
}

// -------------------------------------------------------------- count_gtlt
struct GtLt {
  u64 gt, lt;
};

GtLt count_gtlt_u8(const u8* a, const u8* b, size_t m) {
  u64 g = 0, l = 0;
  size_t i = 0;
  for (; i + 64 <= m; i += 64) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    g += _mm_popcnt_u64(_mm512_cmpgt_epu8_mask(va, vb));
    l += _mm_popcnt_u64(_mm512_cmplt_epu8_mask(va, vb));
  }
  for (; i < m; ++i) {
    g += a[i] > b[i];
    l += a[i] < b[i];
  }
  return {g, l};
}

GtLt count_gtlt_u16(const u16* a, const u16* b, size_t m) {
  u64 g = 0, l = 0;
  size_t i = 0;
  for (; i + 32 <= m; i += 32) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    g += _mm_popcnt_u32(_mm512_cmpgt_epu16_mask(va, vb));
    l += _mm_popcnt_u32(_mm512_cmplt_epu16_mask(va, vb));
  }
  for (; i < m; ++i) {
    g += a[i] > b[i];
    l += a[i] < b[i];
  }
  return {g, l};
}

GtLt count_gtlt_u32(const u32* a, const u32* b, size_t m) {
  u64 g = 0, l = 0;
  size_t i = 0;
  for (; i + 16 <= m; i += 16) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    g += _mm_popcnt_u32(_mm512_cmpgt_epu32_mask(va, vb));
    l += _mm_popcnt_u32(_mm512_cmplt_epu32_mask(va, vb));
  }
  for (; i < m; ++i) {
    g += a[i] > b[i];
    l += a[i] < b[i];
  }
  return {g, l};
}

GtLt count_gtlt_f64(const double* a, const double* b, size_t m) {
  u64 g = 0, l = 0;
  size_t i = 0;
  for (; i + 8 <= m; i += 8) {
    __m512d va = _mm512_loadu_pd(a + i), vb = _mm512_loadu_pd(b + i);
    g += _mm_popcnt_u32(_mm512_cmp_pd_mask(va, vb, _CMP_GT_OQ));
    l += _mm_popcnt_u32(_mm512_cmp_pd_mask(va, vb, _CMP_LT_OQ));
  }
  for (; i < m; ++i) {
    g += a[i] > b[i];
    l += a[i] < b[i];
  }
  return {g, l};
}

GtLt count_gtlt_nib(const u8* a, const u8* b, size_t m) {
  const size_t nb = m / 2;
  u64 g = 0, l = 0;
  size_t i = 0;
  const __m512i lomask = _mm512_set1_epi8(0x0F);
  for (; i + 64 <= nb; i += 64) {
    __m512i va = _mm512_loadu_si512(a + i), vb = _mm512_loadu_si512(b + i);
    __m512i al = _mm512_and_si512(va, lomask), bl = _mm512_and_si512(vb, lomask);
    __m512i ah = _mm512_and_si512(_mm512_srli_epi16(va, 4), lomask);
    __m512i bh = _mm512_and_si512(_mm512_srli_epi16(vb, 4), lomask);
    g += _mm_popcnt_u64(_mm512_cmpgt_epu8_mask(al, bl));
    l += _mm_popcnt_u64(_mm512_cmplt_epu8_mask(al, bl));
    g += _mm_popcnt_u64(_mm512_cmpgt_epu8_mask(ah, bh));
    l += _mm_popcnt_u64(_mm512_cmplt_epu8_mask(ah, bh));
  }
  for (; i < nb; ++i) {
    u8 alo = a[i] & 0xF, blo = b[i] & 0xF, ahi = a[i] >> 4, bhi = b[i] >> 4;
    g += (alo > blo) + (ahi > bhi);
    l += (alo < blo) + (ahi < bhi);
  }
  return {g, l};
}

// ------------------------------------------------------------ sketch phase
static inline u64 wanghash(u64 x) {
  x = (~x) + (x << 21);
  x ^= x >> 24;
  x = (x + (x << 3)) + (x << 8);
  x ^= x >> 14;
  x = (x + (x << 2)) + (x << 4);
  x ^= x >> 28;
  x += x << 31;
  return x;
}

// per-base loop: 2-bit encode, RC-canonical 31-mer, wanghash, OPH
// bucketed min-update (the fastxsketch per-base pipeline)
double sketch_bases_per_sec(size_t nbases, size_t m) {
  std::vector<u8> seq(nbases);
  std::mt19937_64 rng(7);
  for (auto& c : seq) c = rng() & 3;
  std::vector<u64> regs(m, ~0ull);
  const int k = 31;
  const u64 mask = (~0ull) >> (64 - 2 * k);
  const int shift = 2 * (k - 1);
  u64 fwd = 0, rev = 0;
  volatile u64 sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (size_t i = 0; i < nbases; ++i) {
    const u64 c = seq[i];
    fwd = ((fwd << 2) | c) & mask;
    rev = (rev >> 2) | ((c ^ 3ull) << shift);
    if (i + 1 >= (size_t)k) {
      const u64 canon = fwd < rev ? fwd : rev;
      const u64 h = wanghash(canon);
      const size_t idx = h & (m - 1);
      const u64 key = h >> 12;
      if (key < regs[idx]) regs[idx] = key;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  for (auto r : regs) sink ^= r;
  double dt = std::chrono::duration<double>(t1 - t0).count();
  return (double)nbases / dt;
}

volatile u64 g_sink = 0;

template <class F>
double pairs_per_sec(F&& kernel, size_t n, double min_sec = 0.4) {
  // all-pairs upper triangle in 64-row tiles (cache-resident rows)
  const size_t tile = 64;
  double total_pairs = 0, dt = 0;
  auto t0 = std::chrono::steady_clock::now();
  do {
    u64 acc = 0;
    for (size_t bi = 0; bi < n; bi += tile)
      for (size_t bj = bi; bj < n; bj += tile)
        for (size_t i = bi; i < bi + tile && i < n; ++i)
          for (size_t j = (bj > bi ? bj : i + 1); j < bj + tile && j < n; ++j)
            acc += kernel(i, j);
    g_sink ^= acc;
    total_pairs += (double)n * (n - 1) / 2;
    dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
             .count();
  } while (dt < min_sec);
  return total_pairs / dt;
}

void emit(const char* mode, double v, int threads) {
  std::printf(
      "{\"mode\": \"%s\", \"value\": %.6g, \"threads\": %d, "
      "\"projected_32t\": %.6g}\n",
      mode, v, threads, v * 32.0 / threads);
}

}  // namespace

int main(int argc, char** argv) {
  const size_t n = argc > 1 ? atoi(argv[1]) : 1024;
  const size_t m = argc > 2 ? atoi(argv[2]) : 1024;
  std::mt19937_64 rng(42);
  std::vector<u64> d64(n * m);
  for (auto& x : d64) x = rng();
  std::vector<double> df(n * m);
  for (size_t i = 0; i < n * m; ++i)
    df[i] = (double)(d64[i] >> 11) * (1.0 / (1ull << 53));
  std::vector<u32> d32(n * m);
  std::vector<u16> d16(n * m);
  std::vector<u8> d8(n * m), dn(n * m / 2);
  for (size_t i = 0; i < n * m; ++i) {
    d32[i] = (u32)d64[i];
    d16[i] = (u16)d64[i];
    d8[i] = (u8)d64[i];
  }
  for (size_t i = 0; i < n * m / 2; ++i) dn[i] = (u8)rng();

  emit("count_eq_u64", pairs_per_sec([&](size_t i, size_t j) {
         return count_eq_u64(&d64[i * m], &d64[j * m], m);
       }, n), 1);
  emit("count_eq_u32", pairs_per_sec([&](size_t i, size_t j) {
         return count_eq_u32(&d32[i * m], &d32[j * m], m);
       }, n), 1);
  emit("count_eq_u16", pairs_per_sec([&](size_t i, size_t j) {
         return count_eq_u16(&d16[i * m], &d16[j * m], m);
       }, n), 1);
  emit("count_eq_u8", pairs_per_sec([&](size_t i, size_t j) {
         return count_eq_u8(&d8[i * m], &d8[j * m], m);
       }, n), 1);
  emit("count_eq_nibble", pairs_per_sec([&](size_t i, size_t j) {
         return count_eq_nib(&dn[i * m / 2], &dn[j * m / 2], m);
       }, n), 1);
  emit("count_gtlt_f64", pairs_per_sec([&](size_t i, size_t j) {
         auto r = count_gtlt_f64(&df[i * m], &df[j * m], m);
         return r.gt + r.lt;
       }, n), 1);
  emit("count_gtlt_u32", pairs_per_sec([&](size_t i, size_t j) {
         auto r = count_gtlt_u32(&d32[i * m], &d32[j * m], m);
         return r.gt + r.lt;
       }, n), 1);
  emit("count_gtlt_u16", pairs_per_sec([&](size_t i, size_t j) {
         auto r = count_gtlt_u16(&d16[i * m], &d16[j * m], m);
         return r.gt + r.lt;
       }, n), 1);
  emit("count_gtlt_u8", pairs_per_sec([&](size_t i, size_t j) {
         auto r = count_gtlt_u8(&d8[i * m], &d8[j * m], m);
         return r.gt + r.lt;
       }, n), 1);
  emit("count_gtlt_nibble", pairs_per_sec([&](size_t i, size_t j) {
         auto r = count_gtlt_nib(&dn[i * m / 2], &dn[j * m / 2], m);
         return r.gt + r.lt;
       }, n), 1);
  emit("sketch_bases_per_sec", sketch_bases_per_sec(1u << 26, 1024), 1);
  if (g_sink == 0xdeadbeef) std::fprintf(stderr, "sink\n");
  return 0;
}
