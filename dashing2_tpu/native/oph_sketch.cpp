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

#include <atomic>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#include "fastx_reader.h"

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

// Encoding modes, mirroring the device routing in
// sketch/core._hash_chunk_batch + ops/kmers.hashed_kmers:
//   DNA     exact 2-bit codes, RC canonical, k <= 32 (the hot default)
//   BASEB   base-b packed codes (protein reduced alphabets, DNA2)
//   SPACED  spaced-seed codes: kept offsets shifted into one word
//   ROLL    cyclic-polynomial rolling hash (k beyond exact capacity)
//   DNA128  128-bit exact codes; the low word feeds the 64-bit chain
//           (maskfn u128 low-word truncation, enums.h:144-148)
enum Mode { MODE_DNA = 0, MODE_BASEB = 1, MODE_SPACED = 2,
            MODE_ROLL = 3, MODE_DNA128 = 4 };

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
    // generalized-config surface (VERDICT r4 item 1)
    int32_t mode = MODE_DNA;
    int32_t base = 4;        // alphabet size (base-b packing / table size)
    int32_t bits = 2;        // bits per kept base (spaced seeds)
    const int32_t* offsets = nullptr;  // spaced-seed kept positions
    int32_t noffsets = 0;
    const uint64_t* roll_table = nullptr;  // per-symbol rolling table
    const uint64_t* filterset = nullptr;   // sorted exclusion hashes
    int64_t fs_len = 0;
    int64_t vspan = 0;       // validity-window length (span for spaced,
                             // k otherwise); npos = L - vspan + 1
    uint64_t xormask2 = 0;   // hi-word seed mask (u128 maskfn,
                             // enums.h:144-148)
    bool want_hi = false;    // DNA128: also retain masked hi words
};

struct RowScratch {
    std::vector<uint64_t> fwd_packed;   // bases reversed, 2-bit LE
    std::vector<uint64_t> rc_packed;    // complemented bases, 2-bit LE
    std::vector<int32_t> run;           // valid-run length ending at base
    std::vector<uint64_t> score;        // minimizer scores (w > k)
    std::vector<uint64_t> wmin;         // per-window minima (w > k)
    std::vector<uint8_t> sel;           // minimizer-selected mask (w > k)
    std::vector<int32_t> winv;          // invalid-position prefix counts
    std::vector<int32_t> deque;         // (unused; kept for layout)
    std::vector<uint64_t> vhg1, vhg2;   // vH-GW prefix/suffix scratch
    std::vector<uint64_t> wvpad, lvpad; // padded window value/liveness
    std::vector<uint64_t> wvmax, lvmax; // per-position sliding maxima
    std::vector<uint64_t> vals;         // generic modes: per-pos codes
    std::vector<uint64_t> hashed;       // generic modes: scrambled keys
    std::vector<uint64_t> hashed_hi;    // DNA128 want_hi: masked hi words
    std::vector<uint8_t> cln;           // invalid-substituted codes
    std::vector<uint8_t> ccl;           // complement indices (rolling)
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
// Selection pass over a pre-filled s.score array (invalid positions
// already U64MAX). vspan is the validity-window length (k for plain
// k-mers, the seed span for spaced seeds); the minimizer WINDOW count
// stays nwin = w - k + 1 for every mode (device minimizer_mask is
// always called with (k, w), kmers.py:459-462).
// Sliding-window extremum, van Herk–Gil-Werman: out[j] =
// min/max(in[j .. j+W-1]) for j in [0, n-W+1). Two straight-line
// passes (per-block prefix + suffix chains) + one combine — replaces
// the monotonic deque whose branchy pops serialized the minimizer
// selection at ~10 ns/pos (measured: the deque form capped w>k
// configs at ~35 Mbase/s).
static void slide_ext_u64(const uint64_t* in, int64_t n, int64_t W,
                          bool take_min, uint64_t* out,
                          std::vector<uint64_t>& pre,
                          std::vector<uint64_t>& suf) {
    const int64_t nout = n - W + 1;
    if (nout <= 0) return;
    pre.resize(n);
    suf.resize(n);
    for (int64_t b = 0; b < n; b += W) {
        const int64_t e = std::min(b + W, n);
        uint64_t acc = in[b];
        pre[b] = acc;
        for (int64_t i = b + 1; i < e; ++i) {
            acc = take_min ? std::min(acc, in[i]) : std::max(acc, in[i]);
            pre[i] = acc;
        }
        acc = in[e - 1];
        suf[e - 1] = acc;
        for (int64_t i = e - 2; i >= b; --i) {
            acc = take_min ? std::min(acc, in[i]) : std::max(acc, in[i]);
            suf[i] = acc;
        }
    }
    for (int64_t j = 0; j < nout; ++j) {
        const uint64_t a = suf[j], b2 = pre[j + W - 1];
        out[j] = take_min ? std::min(a, b2) : std::max(a, b2);
    }
}

static void select_from_scores(const Params& p, RowScratch& s, bool clean,
                               int64_t npos) {
    const int32_t k = p.k;
    const int64_t vspan = p.vspan > 0 ? p.vspan : k;
    const int64_t nwin = (int64_t)p.w - k + 1;
    const int64_t nw = npos - nwin + 1;          // window count (may be <=0)
    s.sel.assign(npos, 0);
    if (nw <= 0) return;   // no full window: nothing can be selected
    // window liveness: invalid-position prefix counts (clean rows: all
    // windows live, skip the scratch)
    s.winv.clear();
    if (!clean) {
        s.winv.resize(npos + 1);
        s.winv[0] = 0;
        for (int64_t i = 0; i < npos; ++i)
            s.winv[i + 1] = s.winv[i] + (s.run[i + vspan - 1] < vspan);
    }
    auto win_live = [&](int64_t j) -> bool {
        return clean || s.winv[j + nwin] == s.winv[j];
    };
    // wmin[j] = min score over window j (vH-GW pass 1)
    s.wmin.resize(nw);
    slide_ext_u64(s.score.data(), npos, nwin, true, s.wmin.data(),
                  s.vhg1, s.vhg2);
    // per-position max of wmin over the LIVE windows containing i
    // (windows [i-nwin+1, i] clamped at the edges, via nwin-1 zero
    // left-padding): dead/out-of-range windows carry value 0, which
    // can only LOWER a max over the (non-negative) live wmins, never
    // fake a hit — and the hit additionally requires a live window in
    // range, tracked by a parallel sliding max over a 0/1 liveness
    // plane. Exactly the deque's semantics: max over live wmin == sc
    // with at least one live window present.
    const int64_t n2 = npos + nwin - 1;
    s.wvpad.assign(n2, 0);
    s.lvpad.assign(n2, 0);
    for (int64_t j = 0; j < nw; ++j) {
        if (win_live(j)) {
            s.wvpad[j + nwin - 1] = s.wmin[j];
            s.lvpad[j + nwin - 1] = 1;
        }
    }
    s.wvmax.resize(npos);
    s.lvmax.resize(npos);
    slide_ext_u64(s.wvpad.data(), n2, nwin, false, s.wvmax.data(),
                  s.vhg1, s.vhg2);
    slide_ext_u64(s.lvpad.data(), n2, nwin, false, s.lvmax.data(),
                  s.vhg1, s.vhg2);
    for (int64_t i = 0; i < npos; ++i) {
        const uint64_t sc = s.score[i];
        if (!s.lvmax[i] || s.wvmax[i] != sc) continue;
        if (!clean && s.run[i + vspan - 1] < vspan) continue;  // invalid
        bool prev_eq = (i < nwin - 1) && sc == kU64Max;
        const int64_t dmax = std::min<int64_t>(i, nwin - 1);
        for (int64_t d = 1; d <= dmax && !prev_eq; ++d)
            prev_eq = s.score[i - d] == sc;
        s.sel[i] = !prev_eq;
    }
}

// DNA 2-bit score fill (canonical k-mer codes from the packed arrays)
// + selection.
static void minimizer_select(const Params& p, RowScratch& s, bool clean) {
    const int32_t k = p.k;
    const uint64_t mask = (k == 32) ? kU64Max : ((1ULL << (2 * k)) - 1);
    const int64_t npos = p.L - k + 1;
    const int64_t Lk = p.L - k;
    s.score.resize(npos);
    for (int64_t i = 0; i < npos; ++i) {
        if (!clean && s.run[i + k - 1] < k) { s.score[i] = kU64Max; continue; }
        uint64_t v = window2(s.fwd_packed.data(), Lk - i) & mask;
        if (p.canon) {
            const uint64_t rc = window2(s.rc_packed.data(), i) & mask;
            v = std::min(v, rc);
        }
        s.score[i] = v;
    }
    select_from_scores(p, s, clean, npos);
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

static inline uint64_t rotl64s(uint64_t x, int s) {
    s &= 63;
    return s ? (x << s) | (x >> (64 - s)) : x;
}

// Generic-mode per-position code values (s.vals) + scramble keys
// (s.hashed), bit-identical to the device formulations in ops/kmers.py
// (invalid bases substitute code 0 into the value math exactly like
// the device's where(bad, 0, codes); validity is masked separately via
// the run array). Returns npos.
static int64_t compute_values(const Params& p, const uint8_t* row,
                              RowScratch& s, bool clean) {
    const int64_t L = p.L;
    const int32_t k = p.k;
    const int64_t vspan = p.vspan > 0 ? p.vspan : k;
    const int64_t npos = L - vspan + 1;
    if (npos <= 0) return 0;
    s.vals.assign(npos, 0);
    // invalid-substituted codes, once per row (the device's
    // where(bad, 0, codes)); keeps every inner loop branch-free so the
    // compiler vectorizes the value math (measured ~1.8x on the
    // rolling recurrence vs per-access ternaries)
    const uint8_t* cln = row;
    if (p.mode != MODE_DNA && p.mode != MODE_DNA128) {
        if (!clean) {
            s.cln.resize(L);
            uint8_t* c = s.cln.data();
            for (int64_t i = 0; i < L; ++i)
                c[i] = row[i] == kInvalid ? 0 : row[i];
            cln = c;
        }
    }
    if (p.mode == MODE_DNA) {
        // 2-bit exact path through the generic loop: only taken when a
        // filterset is active (the probe needs the scramble keys, which
        // the fused AVX-512 block engine does not retain)
        const int64_t Lk = L - k;
        const uint64_t mask =
            (k == 32) ? kU64Max : ((1ULL << (2 * k)) - 1);
        for (int64_t i = 0; i < npos; ++i) {
            uint64_t v = window2(s.fwd_packed.data(), Lk - i) & mask;
            if (p.canon) {
                const uint64_t rc =
                    window2(s.rc_packed.data(), i) & mask;
                v = std::min(v, rc);
            }
            s.vals[i] = v;
        }
    } else if (p.mode == MODE_BASEB) {
        // acc = acc * base + c, k vectorizable passes (u64 wrap-around
        // multiply-add is order-exact; kmers.base_b_kmer_codes)
        const uint64_t base = (uint64_t)p.base;
        uint64_t* __restrict v = s.vals.data();
        for (int32_t j = 0; j < k; ++j) {
            const uint8_t* __restrict cj = cln + j;
            for (int64_t i = 0; i < npos; ++i)
                v[i] = v[i] * base + cj[i];
        }
    } else if (p.mode == MODE_SPACED) {
        // acc = (acc << bits) | c over the kept offsets
        // (kmers.spaced_kmer_codes; no canonicalization, like the device)
        uint64_t* __restrict v = s.vals.data();
        const int bits = p.bits;
        for (int32_t oi = 0; oi < p.noffsets; ++oi) {
            const uint8_t* __restrict cj = cln + p.offsets[oi];
            for (int64_t i = 0; i < npos; ++i)
                v[i] = (v[i] << bits) | cj[i];
        }
    } else if (p.mode == MODE_ROLL) {
        // cyclic-polynomial rolling hash (kmers.rolling_hash_codes):
        //   h_i = XOR_j rotl(T[c_{i+j}], (k-1-j) mod 64)
        // via the O(1)/position recurrence
        //   h_{i+1} = rotl(h_i,1) ^ rotl(T[c_i], k%64) ^ T[c_{i+k}]
        // (rotation exponents live mod 64, so the algebra holds for
        // any k). Canonical (DNA only, like the device): the mirrored
        // complement-table recurrence, elementwise min.
        const uint64_t* T = p.roll_table;
        // pre-rotated tables lift the per-step rotl off the carried
        // dependency chain; the recurrence runs to npos-1 so no bounds
        // guard lives inside the loop
        uint64_t Tk[64], h = 0;
        for (int32_t c = 0; c < p.base; ++c)
            Tk[c] = rotl64s(T[c], (int)(k % 64));
        for (int32_t j = 0; j < k; ++j)
            h ^= rotl64s(T[cln[j]], (int)((k - 1 - j) % 64));
        uint64_t* __restrict v = s.vals.data();
        for (int64_t i = 0; i < npos - 1; ++i) {
            v[i] = h;
            h = rotl64s(h, 1) ^ Tk[cln[i]] ^ T[cln[i + k]];
        }
        v[npos - 1] = h;
        if (p.canon) {
            // rc_i = XOR_j rotl(Tc[c_{i+j}], j mod 64), Tc via the
            // complement INDEX (bad bases index slot 0, matching the
            // device's where(bad, 0, 3 - safe)): a per-row complement
            // index buffer keeps the loop branch-free
            const uint8_t* ccl;
            if (clean && p.base == 4) {
                static const uint8_t comp4[4] = {3, 2, 1, 0};
                s.ccl.resize(L);
                uint8_t* c = s.ccl.data();
                for (int64_t i = 0; i < L; ++i) c[i] = comp4[row[i]];
                ccl = c;
            } else {
                s.ccl.resize(L);
                uint8_t* c = s.ccl.data();
                for (int64_t i = 0; i < L; ++i)
                    c[i] = row[i] == kInvalid ? 0 : 3 - row[i];
                ccl = c;
            }
            uint64_t Tk1[64], rc = 0;
            for (int32_t c = 0; c < p.base; ++c)
                Tk1[c] = rotl64s(T[c], (int)((k - 1) % 64));
            for (int32_t j = 0; j < k; ++j)
                rc ^= rotl64s(T[ccl[j]], (int)(j % 64));
            for (int64_t i = 0; i < npos - 1; ++i) {
                if (rc < v[i]) v[i] = rc;
                const uint64_t x = rc ^ T[ccl[i]];
                rc = ((x >> 1) | (x << 63)) ^ Tk1[ccl[i + k]];
            }
            if (rc < v[npos - 1]) v[npos - 1] = rc;
        }
    } else {  // MODE_DNA128
        // 128-bit exact codes from the same two packed arrays as the
        // 64-bit path (pack_row): lo/hi are two windowed loads each.
        // Canonical = 128-bit (hi, lo) min; the minimizer SCORE is
        // (hi >> 1) ^ lo and the sketch key is the low word
        // (sketch/core._hash_chunk_batch 128-bit branch).
        const int64_t Lk = L - k;
        const uint64_t lomask =
            (k >= 32) ? kU64Max : ((1ULL << (2 * k)) - 1);
        const int hb = (int)(2 * k - 64);   // hi width in bits
        const uint64_t himask =
            hb <= 0 ? 0 : (hb >= 64 ? kU64Max : ((1ULL << hb) - 1));
        s.hashed.resize(npos);   // reused as the lo-word buffer here
        if (p.want_hi) s.hashed_hi.resize(npos);
        for (int64_t i = 0; i < npos; ++i) {
            const int64_t q = Lk - i;
            uint64_t flo = window2(s.fwd_packed.data(), q) & lomask;
            uint64_t fhi = hb <= 0 ? 0
                : window2(s.fwd_packed.data(), q + 32) & himask;
            uint64_t lo = flo, hi = fhi;
            if (p.canon) {
                const uint64_t rlo =
                    window2(s.rc_packed.data(), i) & lomask;
                const uint64_t rhi = hb <= 0 ? 0
                    : window2(s.rc_packed.data(), i + 32) & himask;
                if (rhi < fhi || (rhi == fhi && rlo < flo)) {
                    lo = rlo; hi = rhi;
                }
            }
            s.vals[i] = (hi >> 1) ^ lo;
            s.hashed[i] = lo;
            if (p.want_hi) s.hashed_hi[i] = hi;
        }
    }
    // scramble keys: maskfn(key) = WangHash(key ^ xormask); seed 0
    // passes raw codes through (ops/hashes.maskfn). Plain
    // branch-hoisted loops so the compiler vectorizes the hash chain
    // across positions (AVX512DQ vpmullq).
    if (p.mode == MODE_DNA128) {
        if (!p.seed_is_zero) {
            uint64_t* h = s.hashed.data();
            const uint64_t xm = p.xormask;
            for (int64_t i = 0; i < npos; ++i)
                h[i] = wanghash(h[i] ^ xm);
            if (p.want_hi) {
                uint64_t* hh = s.hashed_hi.data();
                const uint64_t xm2 = p.xormask2;
                for (int64_t i = 0; i < npos; ++i)
                    hh[i] = wanghash(hh[i] ^ xm2);
            }
        }
    } else {
        s.hashed.resize(npos);
        uint64_t* h = s.hashed.data();
        const uint64_t* v = s.vals.data();
        if (p.seed_is_zero) {
            std::copy(v, v + npos, h);
        } else {
            const uint64_t xm = p.xormask;
            for (int64_t i = 0; i < npos; ++i)
                h[i] = wanghash(v[i] ^ xm);
        }
    }
    return npos;
}

// Generic-mode row loop: values -> (optional) minimizer selection ->
// liveness checks -> OPH bucket-min. Scalar per live position; the
// non-default configs this serves (protein, spaced, rolling k>32,
// 128-bit, filterset) are correctness surface first — the AVX-512
// block engine below keeps the hot default-DNA path.
static void sketch_row_generic(const Params& p, const uint8_t* row,
                               RowScratch& s, uint64_t* regs,
                               uint32_t* cnts) {
    const int64_t vspan = p.vspan > 0 ? p.vspan : p.k;
    const bool clean = memchr(row, kInvalid, (size_t)p.L) == nullptr;
    if (!clean) {
        s.run.assign(p.L + 8, 0);
        int32_t run = 0;
        for (int64_t i = 0; i < p.L; ++i) {
            run = (row[i] == kInvalid) ? 0 : run + 1;
            s.run[i] = run;
        }
    }
    if (p.mode == MODE_DNA128 || p.mode == MODE_DNA)
        pack_row(p, row, s);
    const int64_t npos = compute_values(p, row, s, clean);
    const bool use_sel = p.w > p.k;
    if (use_sel) {
        s.score.resize(npos);
        for (int64_t i = 0; i < npos; ++i)
            s.score[i] = (!clean && s.run[i + vspan - 1] < vspan)
                ? kU64Max : s.vals[i];
        select_from_scores(p, s, clean, npos);
    }
    const int64_t lo = std::max<int64_t>(p.own_lo, 0);
    const int64_t hi = std::min<int64_t>(p.own_hi, npos);
    if (hi <= lo) return;
    const bool pow2 = (p.m & (p.m - 1)) == 0;
    const uint64_t mmask = (uint64_t)p.m - 1;
    // vectorized passes over the owned range: OPH ids (and the
    // downsample keep mask) are straight-line hash chains the compiler
    // vectorizes; only the bucket-min update stays scalar (like the
    // AVX-512 DNA engine's phase split).
    const int64_t nown = hi - lo;
    s.vals.resize((size_t)std::max<int64_t>(nown, 1));  // reuse as ids
    {
        uint64_t* ids = s.vals.data();
        const uint64_t* h = s.hashed.data() + lo;
        const uint64_t ox = p.oph_xor;
        for (int64_t t = 0; t < nown; ++t)
            ids[t] = wanghash(h[t] ^ ox);
    }
    s.score.resize((size_t)std::max<int64_t>(nown, 1));  // reuse: keep
    uint64_t* keep = s.score.data();
    if (p.downsample) {
        const uint64_t* h = s.hashed.data() + lo;
        const uint64_t salt = p.ds_salt, thr = p.ds_threshold;
        for (int64_t t = 0; t < nown; ++t)
            keep[t] = wanghash(h[t] ^ salt) < thr;
    } else {
        std::fill(keep, keep + nown, 1);
    }
    const uint64_t* ids = s.vals.data();
    // admission cutoff (same trick as the DNA fast path): an id
    // strictly above max(regs) can't update or tie any register, so
    // it skips the whole liveness/filterset chain. Refreshed per
    // kBlock positions; stale values only admit extra candidates.
    uint64_t cutoff = *std::max_element(regs, regs + p.m);
    for (int64_t t = 0; t < nown; ++t) {
        if ((t & (kBlock - 1)) == kBlock - 1)
            cutoff = *std::max_element(regs, regs + p.m);
        if (ids[t] > cutoff || !keep[t]) continue;
        const int64_t i = lo + t;
        if (!clean && s.run[i + vspan - 1] < vspan) continue;
        if (use_sel && !s.sel[i]) continue;
        if (p.fs_len && std::binary_search(
                p.filterset, p.filterset + p.fs_len, s.hashed[i]))
            continue;
        const uint64_t id = ids[t];
        const uint64_t b = pow2 ? (id & mmask) : (id % (uint64_t)p.m);
        if (cnts) {
            if (id < regs[b]) { regs[b] = id; cnts[b] = 1; }
            else if (id == regs[b]) ++cnts[b];
        } else if (id < regs[b]) {
            regs[b] = id;
        }
    }
}

// The hot default-DNA path for one row/record: pack -> (minimizers) ->
// AVX-512 block hashing -> scalar bucket-min. regs/cnts ACCUMULATE
// (callers reset per item); p.L is the row length, p.own_lo/own_hi the
// owned k-mer position window (chunk halos; whole-record callers pass
// [0, L)).
static void sketch_row_dna(const Params& p, const uint8_t* row,
                           RowScratch& s, uint64_t* regs,
                           uint32_t* cnts) {
    const int32_t k = p.k;
    const uint64_t mask = (k == 32) ? kU64Max : ((1ULL << (2 * k)) - 1);
    const int64_t npos = p.L - k + 1;
    const int64_t lo = std::max<int64_t>(p.own_lo, 0);
    const int64_t hi = std::min<int64_t>(p.own_hi, npos);
    const bool pow2 = (p.m & (p.m - 1)) == 0;
    const uint64_t mmask = (uint64_t)p.m - 1;
    {
        if (hi <= lo) return;
        const bool clean = pack_row(p, row, s);
        const bool use_sel = p.w > p.k;
        if (use_sel) minimizer_select(p, s, clean);
        const int64_t Lk = p.L - k;
        // bucket-min admission cutoff: an id STRICTLY above max(regs)
        // can neither lower any register nor tie one (counts), so it
        // folds into the vector liveness mask and never reaches the
        // scalar phase. The cutoff is refreshed per kBlock (m loads
        // per 1024 positions); staleness is safe — max(regs) only
        // decreases, so a stale cutoff only admits extra candidates.
        // After ~m*ln(npos/m) updates almost every position skips:
        // measured 10 -> ~6 ns/base on the north-star shape.
        uint64_t cutoff = *std::max_element(regs, regs + p.m);
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
                // admission cutoff: id > max(regs) can't update or tie
                mk &= _mm512_cmple_epu64_mask(
                    id, _mm512_set1_epi64((long long)cutoff));
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
                    ok &= (uint8_t)(s.ids[t + i] <= cutoff);
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
            // scalar phase: bucket-min (+ multiplicity) updates,
            // iterating only the admitted candidates (ctz walk over
            // the liveness bytes — after warm-up nearly every group
            // byte is zero and the loop touches nothing)
            const int ng = (n + 7) >> 3;
            if (cnts) {
                for (int g = 0; g < ng; ++g) {
                    uint8_t mb = s.live[g];
                    while (mb) {
                        const int t = g * 8 + __builtin_ctz(mb);
                        mb = (uint8_t)(mb & (mb - 1));
                        const uint64_t id = s.ids[t];
                        const uint64_t b = pow2 ? (id & mmask)
                                                : (id % (uint64_t)p.m);
                        if (id < regs[b]) { regs[b] = id; cnts[b] = 1; }
                        else if (id == regs[b]) ++cnts[b];
                    }
                }
            } else {
                for (int g = 0; g < ng; ++g) {
                    uint8_t mb = s.live[g];
                    while (mb) {
                        const int t = g * 8 + __builtin_ctz(mb);
                        mb = (uint8_t)(mb & (mb - 1));
                        const uint64_t id = s.ids[t];
                        const uint64_t b = pow2 ? (id & mmask)
                                                : (id % (uint64_t)p.m);
                        if (id < regs[b]) regs[b] = id;
                    }
                }
            }
            cutoff = *std::max_element(regs, regs + p.m);
        }
    }
}

// One row/record through the engine matching its config: the AVX-512
// DNA fast path, or the generic per-position loop (non-default
// encodings, and filterset probes which need the scramble keys).
static inline void sketch_one(const Params& p, const uint8_t* row,
                              RowScratch& s, uint64_t* regs,
                              uint32_t* cnts) {
    if (p.mode != MODE_DNA || p.fs_len > 0)
        sketch_row_generic(p, row, s, regs, cnts);
    else
        sketch_row_dna(p, row, s, regs, cnts);
}

static void sketch_rows(const Params& p, int64_t r0, int64_t r1) {
    RowScratch s;
    for (int64_t r = r0; r < r1; ++r) {
        const uint8_t* row = p.codes + r * p.L;
        uint64_t* regs = p.out_regs + r * p.m;
        uint32_t* cnts = p.out_counts ? p.out_counts + r * p.m : nullptr;
        std::fill(regs, regs + p.m, kU64Max);
        if (cnts) std::fill(cnts, cnts + p.m, 0u);
        sketch_one(p, row, s, regs, cnts);
    }
}

// File-driver engine: read + encode + sketch entire FASTX path groups
// natively — no per-record host<->Python traffic at all. Measured on
// the north-star (10240 x 50 kb, 1 host core): the chunk-batched route
// spends ~4.5 s of its 9 s sketch phase on Python-side record copies,
// batch packing and ctypes plumbing; this driver removes all of it
// (VERDICT r4 item 2 — the reference's P4 native ingest,
// src/fqfeeder.cpp + fastxsketch.cpp:302-424, fused with sketching).
// Items (path groups) are scheduled dynamically over threads; each
// thread owns one Reader + scratch, records accumulate into the item's
// registers exactly like the batched path's merge (bucket-min is
// partition-order-free, so results are bit-identical to the chunked
// engines — asserted per config by tests/test_native_oph.py).
struct FileDriver {
    const Params* base;
    const char* const* paths;
    const int32_t* item_of;     // ascending item id per path
    int64_t npaths, nitems;
    const uint8_t* lut;
    std::atomic<int64_t> next_item{0};
    std::atomic<int64_t> first_err{0};   // -(path_idx+1), 0 = ok

    void run() {
        d2fastx::Reader rd;
        RowScratch s;
        for (;;) {
            const int64_t it = next_item.fetch_add(1);
            if (it >= nitems) break;
            uint64_t* regs = base->out_regs + it * base->m;
            uint32_t* cnts = base->out_counts
                ? base->out_counts + it * base->m : nullptr;
            std::fill(regs, regs + base->m, kU64Max);
            if (cnts) std::fill(cnts, cnts + base->m, 0u);
            // paths of item `it` are contiguous in the ascending
            // item_of list: binary-search the range start
            const int32_t* lo32 = std::lower_bound(
                item_of, item_of + npaths, (int32_t)it);
            for (int64_t pi = lo32 - item_of;
                 pi < npaths && item_of[pi] == it;
                 ++pi) {
                if (!rd.open(paths[pi], lut)) {
                    int64_t e = -(pi + 1), cur = 0;
                    first_err.compare_exchange_strong(cur, e);
                    continue;
                }
                long n;
                while ((n = rd.next()) >= 0) {
                    if (n < 1) continue;
                    Params rec = *base;
                    rec.codes = nullptr;
                    rec.L = n;
                    rec.own_lo = 0;
                    rec.own_hi = n;   // clamped to npos inside
                    sketch_one(rec, rd.seq, s, regs, cnts);
                }
                if (n == -2) {
                    int64_t e = -(pi + 1), cur = 0;
                    first_err.compare_exchange_strong(cur, e);
                }
                rd.close();
            }
        }
    }
};

}  // namespace

extern "C" {

// codes: (R, L) row-major uint8 alphabet codes (0xFF invalid).
// mode/base/bits/offsets/roll_table select the encoding (enum Mode);
// filterset is a sorted u64 exclusion list probed on the scramble
// keys; vspan is the validity-window length (seed span for spaced
// seeds, k otherwise). out_regs: (R, m) u64; out_counts: (R, m) u32
// or null.
void oph_rows_native(const uint8_t* codes, int64_t R, int64_t L,
                     int32_t k, int32_t w, int32_t canon,
                     int32_t seed_is_zero,
                     uint64_t xormask, uint64_t oph_xor,
                     int32_t downsample, uint64_t ds_threshold,
                     uint64_t ds_salt, int64_t own_lo, int64_t own_hi,
                     int64_t m, int32_t nthreads,
                     int32_t mode, int32_t base, int32_t bits,
                     const int32_t* offsets, int32_t noffsets,
                     const uint64_t* roll_table,
                     const uint64_t* filterset, int64_t fs_len,
                     int64_t vspan,
                     uint64_t* out_regs, uint32_t* out_counts) {
    Params p{codes, R, L, k, w, canon != 0, seed_is_zero != 0,
             downsample != 0,
             xormask, oph_xor, ds_threshold, ds_salt,
             own_lo, own_hi, m, out_regs, out_counts,
             mode, base, bits, offsets, noffsets, roll_table,
             filterset, fs_len, vspan};
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

// Compacted host k-mer hashing for screening (contain subcommand):
// (R, L) code rows -> the valid scrambled k-mer hashes, concatenated.
// Same encode/mask/minimizer/filterset/downsample semantics as the
// sketch engines (whole rows owned outright — callers pass one record
// per row). Replaces a device round trip that pulled the full
// (R, npos) u64 hash matrix back over the ~15-37 MB/s tunnel
// (measured 475 s to screen 32 MB of queries; this path is ~0.1 s).
// out capacity must be >= R * (L - vspan + 1); returns the count.
static int64_t hash_row_compact(const Params& p, const uint8_t* row,
                                RowScratch& s, uint64_t* out,
                                uint64_t* out_hi = nullptr) {
    const int64_t vspan = p.vspan > 0 ? p.vspan : p.k;
    const bool clean = memchr(row, kInvalid, (size_t)p.L) == nullptr;
    if (!clean) {
        s.run.assign(p.L + 8, 0);
        int32_t run = 0;
        for (int64_t i = 0; i < p.L; ++i) {
            run = (row[i] == kInvalid) ? 0 : run + 1;
            s.run[i] = run;
        }
    }
    if (p.mode == MODE_DNA128 || p.mode == MODE_DNA)
        pack_row(p, row, s);
    const int64_t npos = compute_values(p, row, s, clean);
    const bool use_sel = p.w > p.k;
    if (use_sel) {
        s.score.resize(npos);
        for (int64_t i = 0; i < npos; ++i)
            s.score[i] = (!clean && s.run[i + vspan - 1] < vspan)
                ? kU64Max : s.vals[i];
        select_from_scores(p, s, clean, npos);
    }
    int64_t nout = 0;
    for (int64_t i = 0; i < npos; ++i) {
        if (!clean && s.run[i + vspan - 1] < vspan) continue;
        if (use_sel && !s.sel[i]) continue;
        const uint64_t h = s.hashed[i];
        if (p.downsample
            && wanghash(h ^ p.ds_salt) >= p.ds_threshold) continue;
        if (p.fs_len && std::binary_search(
                p.filterset, p.filterset + p.fs_len, h))
            continue;
        if (out_hi) out_hi[nout] = s.hashed_hi[i];
        out[nout++] = h;
    }
    return nout;
}

// u128 screening/counting hash entry: DNA128 full keys, masked per
// word (u128 maskfn, enums.h:144-148). Writes compacted (hi', lo')
// into out_hi/out_lo; returns the count.
static int64_t hash_rows128_impl(const uint8_t* codes, int64_t R,
                                 int64_t L, const Params& base,
                                 uint64_t* out_hi, uint64_t* out_lo) {
    RowScratch s;
    int64_t total = 0;
    for (int64_t r = 0; r < R; ++r)
        total += hash_row_compact(base, codes + r * L, s,
                                  out_lo + total, out_hi + total);
    return total;
}

// Fused reg2sig + nibble pack for the --fastcmp 0.5 --bbit-sigs
// compress step: out[i/2] = (WangHash(regs[2i]^xorv)&0xF)
//                         | (WangHash(regs[2i+1]^xorv)&0xF)<<4.
// The numpy chain (7 vector passes with temporaries over 10M u64)
// measured 0.85 s on the north-star critical path; this is ~25 ms.
void reg2sig_nibble(const uint64_t* regs, int64_t n, uint64_t xorv,
                    uint8_t* out) {
    int64_t i = 0;
    for (; i + 1 < n; i += 2) {
        const uint8_t lo = (uint8_t)(wanghash(regs[i] ^ xorv) & 0xF);
        const uint8_t hi = (uint8_t)(wanghash(regs[i + 1] ^ xorv) & 0xF);
        out[i >> 1] = (uint8_t)(lo | (hi << 4));
    }
    if (i < n)
        out[i >> 1] = (uint8_t)(wanghash(regs[i] ^ xorv) & 0xF);
}

// Host inverse of cmp/core._pack_tri_counts_fn: three concatenated
// byte planes -> 2 `bits`-wide u16 counts per 3 bytes (the numpy
// strided-store form measured 1.3 s for 57M counts; this is ~60 ms).
void unpack_counts24(const uint8_t* buf, int64_t t2, int32_t bits,
                     uint16_t* out) {
    const uint8_t* b0 = buf;
    const uint8_t* b1 = buf + t2;
    const uint8_t* b2 = buf + 2 * t2;
    const uint32_t mask = (1u << bits) - 1u;
    for (int64_t i = 0; i < t2; ++i) {
        const uint32_t x = (uint32_t)b0[i] | ((uint32_t)b1[i] << 8)
                           | ((uint32_t)b2[i] << 16);
        out[2 * i] = (uint16_t)(x & mask);
        out[2 * i + 1] = (uint16_t)(x >> bits);
    }
}

// unpack_counts24 fused with the (m+1)-entry similarity table lookup:
// byte planes -> f32 measure values in one pass (the numpy route
// materialized a u16 matrix then gathered the table per block).
void unpack_counts24_f32(const uint8_t* buf, int64_t t2, int32_t bits,
                         const float* table, float* out) {
    const uint8_t* b0 = buf;
    const uint8_t* b1 = buf + t2;
    const uint8_t* b2 = buf + 2 * t2;
    const uint32_t mask = (1u << bits) - 1u;
    for (int64_t i = 0; i < t2; ++i) {
        const uint32_t x = (uint32_t)b0[i] | ((uint32_t)b1[i] << 8)
                           | ((uint32_t)b2[i] << 16);
        out[2 * i] = table[x & mask];
        out[2 * i + 1] = table[x >> bits];
    }
}

// Streamed OPH update over PRE-HASHED u64 items (interval sketching:
// BED/BigWig/LeafCutter items are chrhash^position values, no k-mer
// encode needed). Same id chain and bucket-min/multiplicity semantics
// as the row engines: id = WangHash(item ^ oph_xor), register = min.
// regs/cnts accumulate across calls (caller initializes once per
// item). Replaces the per-slab device segment engine whose CPU-backend
// walls measured 97 s / 7 GB RSS at 7.6M intervals.
void oph_update_hashed(const uint64_t* items, int64_t n,
                       uint64_t oph_xor, int64_t m,
                       uint64_t* regs, uint32_t* cnts) {
    const bool pow2 = (m & (m - 1)) == 0;
    const uint64_t mmask = (uint64_t)m - 1;
    if (cnts) {
        for (int64_t i = 0; i < n; ++i) {
            const uint64_t id = wanghash(items[i] ^ oph_xor);
            const uint64_t b = pow2 ? (id & mmask) : (id % (uint64_t)m);
            if (id < regs[b]) { regs[b] = id; cnts[b] = 1; }
            else if (id == regs[b]) ++cnts[b];
        }
    } else {
        for (int64_t i = 0; i < n; ++i) {
            const uint64_t id = wanghash(items[i] ^ oph_xor);
            const uint64_t b = pow2 ? (id & mmask) : (id % (uint64_t)m);
            if (id < regs[b]) regs[b] = id;
        }
    }
}

// Screening hash entry (see hash_row_compact): returns the number of
// hashes written to out (capacity R * (L - vspan + 1)).
int64_t hash_rows_native(const uint8_t* codes, int64_t R, int64_t L,
                         int32_t k, int32_t w, int32_t canon,
                         int32_t seed_is_zero,
                         uint64_t xormask, int32_t downsample,
                         uint64_t ds_threshold, uint64_t ds_salt,
                         int32_t mode, int32_t base, int32_t bits,
                         const int32_t* offsets, int32_t noffsets,
                         const uint64_t* roll_table,
                         const uint64_t* filterset, int64_t fs_len,
                         int64_t vspan, uint64_t* out) {
    Params p{codes, R, L, k, w, canon != 0, seed_is_zero != 0,
             downsample != 0, xormask, 0, ds_threshold, ds_salt,
             0, L, 0, nullptr, nullptr,
             mode, base, bits, offsets, noffsets, roll_table,
             filterset, fs_len, vspan};
    RowScratch s;
    int64_t total = 0;
    for (int64_t r = 0; r < R; ++r)
        total += hash_row_compact(p, codes + r * L, s, out + total);
    return total;
}

// C ABI for hash_rows128_impl (mode is implicitly DNA128).
int64_t hash_rows_native128(const uint8_t* codes, int64_t R, int64_t L,
                            int32_t k, int32_t w, int32_t canon,
                            int32_t seed_is_zero,
                            uint64_t xormask, uint64_t xormask2_hi,
                            int32_t downsample, uint64_t ds_threshold,
                            uint64_t ds_salt,
                            const uint64_t* filterset, int64_t fs_len,
                            uint64_t* out_hi, uint64_t* out_lo) {
    Params p{codes, R, L, k, w, canon != 0, seed_is_zero != 0,
             downsample != 0, xormask, 0, ds_threshold, ds_salt,
             0, L, 0, nullptr, nullptr,
             MODE_DNA128, 4, 2, nullptr, 0, nullptr,
             filterset, fs_len, k};
    p.xormask2 = xormask2_hi;
    p.want_hi = true;
    return hash_rows128_impl(codes, R, L, p, out_hi, out_lo);
}

// File-driver entry: sketch `nitems` path groups straight from disk.
// paths: npaths C strings; item_of: ascending item id per path;
// lut: 256-byte alphabet encoding table (0xFF = invalid). All hash /
// engine parameters are as oph_rows_native (no chunk geometry — whole
// records are owned outright). out_regs: (nitems, m) u64; out_counts:
// (nitems, m) u32 or null. Returns 0, or -(i+1) where paths[i] is the
// first path that failed to open or parse.
int64_t oph_sketch_files(const char* const* paths, const int32_t* item_of,
                         int64_t npaths, int64_t nitems,
                         const uint8_t* lut,
                         int32_t k, int32_t w, int32_t canon,
                         int32_t seed_is_zero,
                         uint64_t xormask, uint64_t oph_xor,
                         int32_t downsample, uint64_t ds_threshold,
                         uint64_t ds_salt, int64_t m, int32_t nthreads,
                         int32_t mode, int32_t base, int32_t bits,
                         const int32_t* offsets, int32_t noffsets,
                         const uint64_t* roll_table,
                         const uint64_t* filterset, int64_t fs_len,
                         int64_t vspan,
                         uint64_t* out_regs, uint32_t* out_counts) {
    Params p{nullptr, 0, 0, k, w, canon != 0, seed_is_zero != 0,
             downsample != 0,
             xormask, oph_xor, ds_threshold, ds_salt,
             0, 0, m, out_regs, out_counts,
             mode, base, bits, offsets, noffsets, roll_table,
             filterset, fs_len, vspan};
    FileDriver d;
    d.base = &p;
    d.paths = paths;
    d.item_of = item_of;
    d.npaths = npaths;
    d.nitems = nitems;
    d.lut = lut;
    int nt = nthreads > 0 ? nthreads
                          : (int)std::thread::hardware_concurrency();
    nt = std::max(1, std::min<int>(nt, (int)std::min<int64_t>(
        nitems, 1 << 10)));
    if (nt == 1) {
        d.run();
    } else {
        std::vector<std::thread> ts;
        ts.reserve(nt);
        for (int t = 0; t < nt; ++t)
            ts.emplace_back([&d] { d.run(); });
        for (auto& t : ts) t.join();
    }
    return d.first_err.load();
}

}  // extern "C"
