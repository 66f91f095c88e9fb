// Long-double estimator-epilogue oracle.
//
// Transcribes the reference's compare() epilogues EXACTLY as written —
// long double arithmetic, fma/ldexp calls, cast points, clamp order,
// per-branch denominator quirks (the full-register branch divides
// CONTAINMENT by rhcard where the compressed branch divides by lhcard)
// — from /root/reference/src/cmp_core.cpp:349-517 and g_b at :323.
// The framework's production epilogues run in f32 on device (PARITY.md
// deviation 7); this oracle turns that deviation's "last ulp" claim
// into a measured number: tests/test_ld_oracle.py sketches real
// corpora, runs both, and records max ulp distance per mode.
//
// Modes:
//   0  full-register gt/lt      (cmp_core.cpp:461-495, SPACE_SET
//                                trunc<=0 signatures)
//   1  equality (eqfull)        (cmp_core.cpp:496-517 count_eq branch)
//   2  compressed a/b gt/lt     (cmp_core.cpp:424-449; g_b when
//                                fd_level < sizeof(RegT))
//   3  compressed b-bit eq      (cmp_core.cpp:407-423)
//
// Measure ints use the framework enum (enums.py Measure, value-matched
// to the reference's): 0 SIMILARITY, 1 CONTAINMENT,
// 2 SYMMETRIC_CONTAINMENT, 3 POISSON_LLR, 4 INTERSECTION, 5 UNION_SIZE.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

namespace {

enum Msr { SIM = 0, CONTAIN = 1, SYMCON = 2, PLLR = 3, ISECT = 4,
           USIZE = 5 };

inline long double g_b(long double b, long double arg) {
    return (1.L - std::pow(b, -arg)) / (1.L - 1.L / b);
}

inline double sim2dist(long double x, int k) {
    // the reference lambda: poisson_mult = -1. / max(1, k); double math
    const double pm = -1. / std::max(1, k);
    if (x)
        return std::log(2. * static_cast<double>(x)
                        / (1. + static_cast<double>(x))) * pm;
    return std::numeric_limits<double>::infinity();
}

}  // namespace

extern "C" void ld_epilogue(
    int mode, int measure, int k, int64_t m, double bq, double fd,
    const int64_t* eqc, const int64_t* gtc, const int64_t* ltc,
    const double* lhv, const double* rhv, int64_t n, float* out) {
    const long double invdenom = 1.L / static_cast<long double>(m);
    for (int64_t i = 0; i < n; ++i) {
        const long double lhcard = lhv[i], rhcard = rhv[i];
        long double ret = std::numeric_limits<float>::max();
        if (mode == 3) {                       // compressed b-bit
            const long double b2pow =
                -std::ldexp(1.L, -static_cast<int>(fd * 8.));
            ret = std::max(0.L, std::fma(static_cast<long double>(eqc[i]),
                                         invdenom, b2pow) / (1.L + b2pow));
            if (measure == ISECT || measure == USIZE) {
                const long double isz = std::max(
                    (lhcard + rhcard) / (2.L - (1.L - ret)), 0.L);
                ret = (measure == ISECT) ? isz : lhcard + rhcard - isz;
            } else if (measure == CONTAIN) {
                ret = std::max((lhcard + rhcard) / (2.L - (1.L - ret)),
                               0.L) * ret / lhcard;
            } else if (measure == PLLR) {
                ret = sim2dist(ret, k);
            } else if (measure == SYMCON) {
                ret = std::max((lhcard + rhcard) / (2.L - (1.L - ret)),
                               0.L) * ret / std::min(lhcard, rhcard);
            }
        } else if (mode == 2) {                // compressed a/b
            long double alpha = gtc[i] * invdenom;
            long double beta = ltc[i] * invdenom;
            long double mu;
            if (fd < 8.0) {
                alpha = g_b(bq, alpha);
                beta = g_b(bq, beta);
            }
            if (alpha + beta >= 1.) {
                mu = lhcard + rhcard;
            } else {
                mu = std::max((lhcard + rhcard) / (2.L - alpha - beta),
                              0.L);
            }
            ret = std::max(1.L - (alpha + beta), 0.L);
            switch (measure) {
                case ISECT: ret *= mu; break;
                case USIZE: ret = lhcard + rhcard - (ret * mu); break;
                case CONTAIN: ret = ret * mu / lhcard; break;
                case SYMCON:
                    ret = (ret * mu) / std::min(lhcard, rhcard); break;
                case PLLR: ret = sim2dist(ret, k); break;
                default:;
            }
        } else if (mode == 0) {                // full-register gt/lt
            const long double alpha = gtc[i] * invdenom;
            const long double beta = ltc[i] * invdenom;
            long double eq = (1. - alpha - beta);
            if (eq <= 0.) {
                out[i] = static_cast<float>(
                    measure != PLLR
                        ? 0.
                        : std::numeric_limits<double>::max());
                continue;
            }
            constexpr long double EPS = 1e-15;
            if (eq <= EPS) eq = 0;
            const long double ucard = std::max(
                (lhcard + rhcard) / (2.L - alpha - beta), 0.L);
            // the reference narrows isz and sim to LSHDistType (float)
            // BEFORE the measure switch — replicated cast points
            const float isz = static_cast<float>(ucard * eq);
            const float sim = static_cast<float>(eq);
            switch (measure) {
                case SIM: ret = sim; break;
                case ISECT: ret = isz; break;
                case CONTAIN: ret = isz / rhcard; break;
                case SYMCON: ret = isz / std::min(lhcard, rhcard); break;
                case PLLR: ret = sim2dist(sim, k); break;
                case USIZE: ret = lhcard + rhcard - isz; break;
                default: ret = -1.; break;
            }
        } else {                               // mode 1: equality
            ret = invdenom * static_cast<long double>(eqc[i]);
            if (measure == ISECT) {
                ret *= std::max((lhcard + rhcard) / (1.L + ret), 0.L);
            } else if (measure == SYMCON) {
                ret *= std::max((lhcard + rhcard) / (1.L + ret), 0.L)
                    / std::min(lhcard, rhcard);
            } else if (measure == CONTAIN) {
                ret *= std::max((lhcard + rhcard) / (1.L + ret), 0.L)
                    / lhcard;
            } else if (measure == PLLR) {
                ret = sim2dist(ret, k);
            } else if (measure == USIZE) {
                const long double isz =
                    ret * std::max((lhcard + rhcard) / (1.L + ret), 0.L);
                ret = (lhcard + rhcard - isz);
            }
        }
        out[i] = static_cast<float>(ret);
    }
}
