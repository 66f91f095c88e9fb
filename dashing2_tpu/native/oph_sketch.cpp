// Native host OPH sketcher for the default DNA path.
//
// Heterogeneous placement: the OPH bucket-min update is scatter-shaped
// (one random register update per k-mer), which TPUs execute as dense
// O(nk*m) vector work or sorts, while host cores run it at ~1 cycle per
// k-mer. On many-core TPU hosts this engine sketches on the CPU while
// the device runs the N^2 comparison phase. Semantics are bit-identical
// to ops/kmers.hashed_kmers + ops/sketch_kernels.oph_sketch_rows for
// the supported configuration (DNA/DNAC 2-bit codes, k <= 32, no
// spaced seeds / rolling / entropy minimizers / filterset):
//   - 2-bit encode with reverse-complement canonicalization
//     (reference bns::Encoder::canonicalize; kmers.py:169-199)
//   - window-w lexicographic minimizer selection when w > k
//     (bns::Encoder window mode; kmers.py:360-394 semantics)
//   - maskfn scrambler WangHash(kmer ^ XORMASK) (enums.h:136)
//   - per-chunk ownership window + optional downsampling
//     (d2.h:176-179 semantics; sketch/core.py:83-91)
//   - OPH id hash WangHash(h ^ mt_seed ^ CEIXOR) with bucket id % m,
//     register = running min, count = multiplicity of the current min
//     (oph.h:55-89,95-281)
//
// Performance structure: a naive rolling loop is a loop-carried scalar
// dependency chain (~40 ops/k-mer serial). Instead each row is packed
// once into two 2-bit arrays — bases in reverse order (so the forward
// k-mer is a little-endian bit window) and complemented bases in
// forward order (so the RC code is one too) — making every k-mer two
// unaligned 64-bit window loads with NO cross-position dependency. The
// hash chain (shift-add multiply form) then vectorizes across a block
// of positions into an id buffer; a short scalar pass does the
// bucket-min update. Rows of a batch are independent -> thread pool.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512DQ__)
#include <immintrin.h>
#define D2_OPH_AVX512 1
#endif

namespace {

constexpr uint8_t kInvalid = 0xFF;   // ops/kmers.py INVALID
constexpr uint64_t kU64Max = ~0ULL;
constexpr int kBlock = 1024;

static inline uint64_t wanghash(uint64_t x) {
    x = (~x) + (x << 21);
    x ^= x >> 24;
    x = (x + (x << 3)) + (x << 8);   // * 265
    x ^= x >> 14;
    x = (x + (x << 2)) + (x << 4);   // * 21
    x ^= x >> 28;
    x += x << 31;
    return x;
}

// little-endian 2-bit window: bits [2q, 2q+2k) of the packed array
static inline uint64_t window2(const uint64_t* packed, int64_t q) {
    const int64_t word = q >> 5;           // 32 bases per u64
    const int s = (int)(q & 31) * 2;
    uint64_t v = packed[word] >> s;
    if (s) v |= packed[word + 1] << (64 - s);
    return v;
}

struct Params {
    const uint8_t* codes;
    int64_t R, L;
    int32_t k, w;            // w > k enables minimizer-window selection
    bool canon, seed_is_zero, downsample;
    uint64_t xormask, oph_xor, ds_threshold, ds_salt;
    int64_t own_lo, own_hi;  // k-mer position window [lo, hi)
    int64_t m;
    uint64_t* out_regs;
    uint32_t* out_counts;
};

struct RowScratch {
    std::vector<uint64_t> fwd_packed;   // bases reversed, 2-bit LE
    std::vector<uint64_t> rc_packed;    // complemented bases, 2-bit LE
    std::vector<int32_t> run;           // valid-run length ending at base
    std::vector<uint64_t> score;        // minimizer scores (w > k)
    std::vector<uint64_t> wmin;         // per-window minima (w > k)
    std::vector<uint8_t> sel;           // minimizer-selected mask (w > k)
    std::vector<int32_t> winv;          // invalid-position prefix counts
    std::vector<int32_t> deque;         // monotonic-deque index ring
    uint64_t ids[kBlock + 8];
    uint8_t live[kBlock / 8 + 2];       // one lane-mask byte per 8 ids
};

// Window-w lexicographic minimizer selection, bit-identical to
// ops/kmers.minimizer_mask: scores are the canonical k-mer CODES
// (invalid positions -> u64::max); a window is LIVE only if all its
// nwin k-mers are valid (the standard streaming reset at sequence
// edges and N-runs — and what makes chunked selection identical to
// unchunked); a position is selected iff its score equals the min of
// some LIVE window containing it AND no equal score occurs in the
// previous nwin-1 positions (leftmost tie break; the device pads
// prev-eq comparisons out of range with u64::max, so a maxv score in
// the first nwin-1 slots "prev-eqs" the padding — mirrored here,
// reachable only for the k=32 all-T k-mer).
static void minimizer_select(const Params& p, RowScratch& s, bool clean) {
    const int32_t k = p.k;
    const uint64_t mask = (k == 32) ? kU64Max : ((1ULL << (2 * k)) - 1);
    const int64_t npos = p.L - k + 1;
    const int64_t nwin = (int64_t)p.w - k + 1;
    const int64_t nw = npos - nwin + 1;          // window count (may be <=0)
    const int64_t Lk = p.L - k;
    s.score.resize(npos);
    s.sel.assign(npos, 0);
    for (int64_t i = 0; i < npos; ++i) {
        if (!clean && s.run[i + k - 1] < k) { s.score[i] = kU64Max; continue; }
        uint64_t v = window2(s.fwd_packed.data(), Lk - i) & mask;
        if (p.canon) {
            const uint64_t rc = window2(s.rc_packed.data(), i) & mask;
            v = std::min(v, rc);
        }
        s.score[i] = v;
    }
    // window liveness: invalid-position prefix counts (clean rows: all
    // windows live, skip the scratch)
    s.winv.clear();
    if (!clean && nw > 0) {
        s.winv.resize(npos + 1);
        s.winv[0] = 0;
        for (int64_t i = 0; i < npos; ++i)
            s.winv[i + 1] = s.winv[i] + (s.run[i + k - 1] < k);
    }
    auto win_live = [&](int64_t j) -> bool {
        return clean || s.winv[j + nwin] == s.winv[j];
    };
    if (nw > 0) {
        // sliding min over scores, window nwin (monotonic deque)
        s.wmin.resize(nw);
        s.deque.clear();
        size_t head = 0;
        for (int64_t i = 0; i < npos; ++i) {
            while (s.deque.size() > head &&
                   s.score[s.deque.back()] > s.score[i])
                s.deque.pop_back();
            s.deque.push_back((int32_t)i);
            if (s.deque[head] <= i - nwin) ++head;
            if (i >= nwin - 1) s.wmin[i - nwin + 1] = s.score[s.deque[head]];
        }
    }
    // hit = (sliding max of wmin over LIVE windows containing i)
    // == score[i]; dead/out-of-range windows contribute nothing; then
    // leftmost tie break.
    s.deque.clear();
    size_t head = 0;
    for (int64_t i = 0; i < npos; ++i) {
        if (i < nw && win_live(i)) {
            while (s.deque.size() > head &&
                   s.wmin[s.deque.back()] <= s.wmin[i])
                s.deque.pop_back();
            s.deque.push_back((int32_t)i);
        }
        while (s.deque.size() > head && s.deque[head] < i - nwin + 1)
            ++head;
        const uint64_t sc = s.score[i];
        if (s.deque.size() <= head || s.wmin[s.deque[head]] != sc) continue;
        if (!clean && s.run[i + k - 1] < k) continue;   // invalid position
        bool prev_eq = (i < nwin - 1) && sc == kU64Max;
        const int64_t dmax = std::min<int64_t>(i, nwin - 1);
        for (int64_t d = 1; d <= dmax && !prev_eq; ++d)
            prev_eq = s.score[i - d] == sc;
        s.sel[i] = !prev_eq;
    }
}

#ifdef D2_OPH_AVX512
// bits [2*q_i, 2*q_i + 64) of the packed stream for 8 per-lane indices
// q_i, all within [32*wlo, 32*wlo + 39): branch-free 3-word funnel.
// Variable shifts with counts >= 64 (incl. wrapped negatives) yield 0,
// and the only overlap (count exactly 64) duplicates bits under OR.
static inline __m512i window8(const uint64_t* packed, int64_t wlo,
                              __m512i qvec) {
    const __m512i w0 = _mm512_set1_epi64((long long)packed[wlo]);
    const __m512i w1 = _mm512_set1_epi64((long long)packed[wlo + 1]);
    const __m512i w2 = _mm512_set1_epi64((long long)packed[wlo + 2]);
    const __m512i u = _mm512_slli_epi64(
        _mm512_sub_epi64(qvec, _mm512_set1_epi64(32 * wlo)), 1);
    const __m512i c64 = _mm512_set1_epi64(64);
    const __m512i c128 = _mm512_set1_epi64(128);
    __m512i v = _mm512_srlv_epi64(w0, u);
    v = _mm512_or_si512(v, _mm512_sllv_epi64(w1, _mm512_sub_epi64(c64, u)));
    v = _mm512_or_si512(v, _mm512_srlv_epi64(w1, _mm512_sub_epi64(u, c64)));
    v = _mm512_or_si512(v, _mm512_sllv_epi64(w2, _mm512_sub_epi64(c128, u)));
    return v;
}

static inline __m512i wanghash8(__m512i x) {
    const __m512i ones = _mm512_set1_epi64(-1);
    x = _mm512_add_epi64(_mm512_xor_si512(x, ones),
                         _mm512_slli_epi64(x, 21));
    x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 24));
    x = _mm512_mullo_epi64(x, _mm512_set1_epi64(265));
    x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 14));
    x = _mm512_mullo_epi64(x, _mm512_set1_epi64(21));
    x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 28));
    x = _mm512_add_epi64(x, _mm512_slli_epi64(x, 31));
    return x;
}
#endif  // D2_OPH_AVX512

// returns true when the row contains no invalid codes (the common
// clean-FASTA case), letting the sketch loop skip the validity mask
static bool pack_row(const Params& p, const uint8_t* row, RowScratch& s) {
    const int64_t L = p.L;
    const int64_t nwords = (L + 31) / 32 + 3;   // +sentinels for funnels
    s.fwd_packed.resize(nwords);
    s.rc_packed.resize(nwords);
    const bool clean = memchr(row, kInvalid, (size_t)L) == nullptr;
    // rc: complemented bases ascending; register-accumulated words
    {
        uint64_t w = 0;
        int64_t wi = 0;
        for (int64_t i = 0; i < L; ++i) {
            const uint8_t c = row[i];
            const uint64_t cv = (c == kInvalid) ? 0 : c;
            w |= (3ULL - cv) << ((i & 31) * 2);
            if ((i & 31) == 31) { s.rc_packed[wi++] = w; w = 0; }
        }
        if (L & 31) s.rc_packed[wi++] = w;
        while (wi < nwords) s.rc_packed[wi++] = 0;
    }
    // fwd: bases in reverse order (slot s <- base L-1-s)
    {
        uint64_t w = 0;
        int64_t wi = 0;
        for (int64_t sl = 0; sl < L; ++sl) {
            const uint8_t c = row[L - 1 - sl];
            const uint64_t cv = (c == kInvalid) ? 0 : c;
            w |= cv << ((sl & 31) * 2);
            if ((sl & 31) == 31) { s.fwd_packed[wi++] = w; w = 0; }
        }
        if (L & 31) s.fwd_packed[wi++] = w;
        while (wi < nwords) s.fwd_packed[wi++] = 0;
    }
    if (!clean) {
        s.run.assign(L + 8, 0);                 // +8: vector tail loads
        int32_t run = 0;
        for (int64_t i = 0; i < L; ++i) {
            run = (row[i] == kInvalid) ? 0 : run + 1;
            s.run[i] = run;
        }
    }
    return clean;
}

static void sketch_rows(const Params& p, int64_t r0, int64_t r1) {
    const int32_t k = p.k;
    const uint64_t mask = (k == 32) ? kU64Max : ((1ULL << (2 * k)) - 1);
    const int64_t npos = p.L - k + 1;
    const int64_t lo = std::max<int64_t>(p.own_lo, 0);
    const int64_t hi = std::min<int64_t>(p.own_hi, npos);
    const bool pow2 = (p.m & (p.m - 1)) == 0;
    const uint64_t mmask = (uint64_t)p.m - 1;
    RowScratch s;
    for (int64_t r = r0; r < r1; ++r) {
        const uint8_t* row = p.codes + r * p.L;
        uint64_t* regs = p.out_regs + r * p.m;
        uint32_t* cnts = p.out_counts ? p.out_counts + r * p.m : nullptr;
        std::fill(regs, regs + p.m, kU64Max);
        if (cnts) std::fill(cnts, cnts + p.m, 0u);
        if (hi <= lo) continue;
        const bool clean = pack_row(p, row, s);
        const bool use_sel = p.w > p.k;
        if (use_sel) minimizer_select(p, s, clean);
        const int64_t Lk = p.L - k;
        for (int64_t b0 = lo; b0 < hi; b0 += kBlock) {
            const int n = (int)std::min<int64_t>(kBlock, hi - b0);
#ifdef D2_OPH_AVX512
            // vector phase: codes -> canonical -> scramble -> OPH id,
            // 8 positions per iteration
            const __m512i vmask = _mm512_set1_epi64((long long)mask);
            const __m512i iota = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
            const __m512i vxorm = _mm512_set1_epi64((long long)p.xormask);
            const __m512i vophx = _mm512_set1_epi64((long long)p.oph_xor);
            const __m512i vsalt = _mm512_set1_epi64((long long)p.ds_salt);
            const __m512i vthr =
                _mm512_set1_epi64((long long)p.ds_threshold);
            const __m256i vk = _mm256_set1_epi32(k);
            for (int t = 0; t < n; t += 8) {
                const int64_t pos0 = b0 + t;
                const int64_t qf0 = Lk - pos0;     // fwd window, descending
                const __m512i qf = _mm512_sub_epi64(
                    _mm512_set1_epi64(qf0), iota);
                const int64_t wlo_f = std::max<int64_t>(0, (qf0 - 7) >> 5);
                __m512i kmer = _mm512_and_si512(
                    window8(s.fwd_packed.data(), wlo_f, qf), vmask);
                if (p.canon) {
                    const __m512i qr = _mm512_add_epi64(
                        _mm512_set1_epi64(pos0), iota);
                    const __m512i rc = _mm512_and_si512(
                        window8(s.rc_packed.data(), pos0 >> 5, qr), vmask);
                    kmer = _mm512_min_epu64(kmer, rc);
                }
                const __m512i hashed =
                    p.seed_is_zero ? kmer
                                   : wanghash8(_mm512_xor_si512(kmer,
                                                                vxorm));
                const __m512i id =
                    wanghash8(_mm512_xor_si512(hashed, vophx));
                _mm512_storeu_si512(s.ids + t, id);
                // liveness: full valid window, ownership range, sampling
                __mmask8 mk = 0xFF;
                if (!clean) {
                    const __m256i rv = _mm256_loadu_si256(
                        (const __m256i*)(s.run.data() + pos0 + k - 1));
                    mk = _mm256_cmp_epi32_mask(rv, vk, _MM_CMPINT_GE);
                }
                if (hi - pos0 < 8)
                    mk &= (__mmask8)((1u << (hi - pos0)) - 1);
                if (p.downsample)
                    mk &= _mm512_cmplt_epu64_mask(
                        wanghash8(_mm512_xor_si512(hashed, vsalt)), vthr);
                s.live[t >> 3] = (uint8_t)mk;
            }
#else
            for (int t = 0; t < n; t += 8) {
                uint8_t mk = 0;
                const int lim = std::min(8, n - t);
                for (int i = 0; i < lim; ++i) {
                    const int64_t pos = b0 + t + i;
                    uint64_t fwd = window2(s.fwd_packed.data(),
                                           Lk - pos) & mask;
                    uint64_t kmer = fwd;
                    if (p.canon) {
                        uint64_t rc = window2(s.rc_packed.data(),
                                              pos) & mask;
                        kmer = std::min(fwd, rc);
                    }
                    uint64_t hashed = p.seed_is_zero
                                          ? kmer
                                          : wanghash(kmer ^ p.xormask);
                    s.ids[t + i] = wanghash(hashed ^ p.oph_xor);
                    uint8_t ok = clean || s.run[pos + k - 1] >= k;
                    if (p.downsample)
                        ok &= (uint8_t)(wanghash(hashed ^ p.ds_salt)
                                        < p.ds_threshold);
                    mk |= (uint8_t)(ok << i);
                }
                s.live[t >> 3] = mk;
            }
#endif
            // minimizer mask folds into the per-lane liveness bytes
            if (use_sel) {
                for (int t = 0; t < n; ++t)
                    if (!s.sel[b0 + t])
                        s.live[t >> 3] &= (uint8_t)~(1u << (t & 7));
            }
            // scalar phase: bucket-min (+ multiplicity) updates
            if (cnts) {
                for (int t = 0; t < n; ++t) {
                    if (!(s.live[t >> 3] >> (t & 7) & 1)) continue;
                    const uint64_t id = s.ids[t];
                    const uint64_t b = pow2 ? (id & mmask)
                                            : (id % (uint64_t)p.m);
                    if (id < regs[b]) { regs[b] = id; cnts[b] = 1; }
                    else if (id == regs[b]) ++cnts[b];
                }
            } else {
                for (int t = 0; t < n; ++t) {
                    if (!(s.live[t >> 3] >> (t & 7) & 1)) continue;
                    const uint64_t id = s.ids[t];
                    const uint64_t b = pow2 ? (id & mmask)
                                            : (id % (uint64_t)p.m);
                    if (id < regs[b]) regs[b] = id;
                }
            }
        }
    }
}

}  // namespace

extern "C" {

// codes: (R, L) row-major uint8 alphabet codes (0..3, 0xFF invalid).
// out_regs: (R, m) u64; out_counts: (R, m) u32 or null.
void oph_rows_native(const uint8_t* codes, int64_t R, int64_t L,
                     int32_t k, int32_t w, int32_t canon,
                     int32_t seed_is_zero,
                     uint64_t xormask, uint64_t oph_xor,
                     int32_t downsample, uint64_t ds_threshold,
                     uint64_t ds_salt, int64_t own_lo, int64_t own_hi,
                     int64_t m, int32_t nthreads,
                     uint64_t* out_regs, uint32_t* out_counts) {
    Params p{codes, R, L, k, w, canon != 0, seed_is_zero != 0,
             downsample != 0,
             xormask, oph_xor, ds_threshold, ds_salt,
             own_lo, own_hi, m, out_regs, out_counts};
    int nt = nthreads > 0 ? nthreads
                          : (int)std::thread::hardware_concurrency();
    nt = std::max(1, std::min<int>(nt, (int)R));
    if (nt == 1) {
        sketch_rows(p, 0, R);
        return;
    }
    std::vector<std::thread> ts;
    ts.reserve(nt);
    const int64_t per = (R + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        const int64_t r0 = t * per, r1 = std::min<int64_t>(R, r0 + per);
        if (r0 >= r1) break;
        ts.emplace_back([&p, r0, r1] { sketch_rows(p, r0, r1); });
    }
    for (auto& t : ts) t.join();
}

}  // extern "C"
