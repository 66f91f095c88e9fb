"""Headline benchmark: pairwise register-comparison throughput on one chip.

Mirrors the BASELINE.json metric ("pairwise comparisons/sec at 10K
genomes"): N sketches of m=1024 f64 registers, all-pairs comparison with
the SetSketch gt/lt estimator inputs. Prints ONE JSON line to stdout.

Accounting is in UNIQUE pairs: a symmetric all-pairs job over N items is
N(N-1)/2 comparisons (the reference's emitrect walk, emitrect.cpp:269-325),
and the circulant self-pairs kernel computes only that half-square. Times
are per delivered full count matrix.

Measurement note: dispatch/sync over the remote TPU tunnel adds a large
constant latency and `block_until_ready` completes early, so per-matrix
time is measured differentially — K matrix computations chained
data-dependently inside one jit (scan), timed at K=1 and K=1+R, per-matrix
= (T_{1+R} - T_1) / R, with a scalar host fetch as the sync point.

vs_baseline: the reference publishes no numbers and its submodules are
absent (unbuildable here). Comparison point: a 32-thread AVX2 CPU running
count_gtlt over m=1024 f64 registers at ~4 regs x 3 ops/cycle/core x 3 GHz
~= 1.25e8 unique pairs/s. The secondary nibble-register (--fastcmp 0.5)
MXU path is reported to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_CPU_PAIRS_PER_SEC = 1.25e8


def main():
    import dashing2_tpu  # noqa: F401  (x64)
    import jax
    import jax.numpy as jnp
    from dashing2_tpu.ops.cmp_kernels import (_circ_seg_index,
                                              _circ_self_counts,
                                              f64_to_ordered_u64)
    from dashing2_tpu.ops.pallas_cmp import _nibble_mxu

    rng = np.random.default_rng(0)
    n, m, t = 4096, 1024, 128
    if jax.default_backend() == "cpu":
        # defensive: the dense device kernels are TPU-shaped; a CPU-only
        # environment still completes (at a small size) instead of hanging
        n = 512
    sigs = np.abs(rng.normal(size=(n, m))) + 1e-9
    su = jnp.asarray(f64_to_ordered_u64(sigs))
    seg = jnp.asarray(_circ_seg_index(n, t))
    unique_pairs = n * (n - 1) / 2

    def make_chain(K):
        @jax.jit
        def run(a):
            def body(carry, _):
                gt = _circ_self_counts(carry, seg, t=t)
                return carry ^ gt[0, 0].astype(jnp.uint64), None
            a2, _ = jax.lax.scan(body, a, None, length=K)
            return a2[0, 0]
        return run

    def timed(fn, arg, reps=3):
        np.asarray(fn(arg))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(arg))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = timed(make_chain(1), su)
    t5 = timed(make_chain(5), su)
    per_matrix = max((t5 - t1) / 4, 1e-9)
    pps = unique_pairs / per_matrix

    # secondary metric: nibble-register MXU path (--fastcmp 0.5)
    try:
        nib = jnp.asarray(rng.integers(0, 16, size=(n, m)).astype(np.uint8))

        def make_mxu(K):
            @jax.jit
            def run(x):
                def body(carry, _):
                    eq, gt, lt = _nibble_mxu(carry, carry, True)
                    return carry ^ gt[0, 0].astype(jnp.uint8), None
                x2, _ = jax.lax.scan(body, x, None, length=K)
                return x2[0, 0]
            return run
        tm1 = timed(make_mxu(1), nib, reps=2)
        tm5 = timed(make_mxu(5), nib, reps=2)
        per_mxu = max((tm5 - tm1) / 4, 1e-9)
        print(f"# nibble-register (--fastcmp 0.5) MXU path: "
              f"{unique_pairs / per_mxu / 1e9:.2f} G unique-pairs/s "
              f"({per_mxu * 1e3:.1f} ms/matrix, "
              f"{unique_pairs / per_mxu / BASELINE_CPU_PAIRS_PER_SEC:.1f}x "
              f"cpu baseline)", file=sys.stderr)
    except Exception as e:
        print(f"# nibble MXU path failed: {e}", file=sys.stderr)

    # secondary metric: device sketching rate (encode+hash+OPH rows)
    try:
        from dashing2_tpu import hashing as HH
        from dashing2_tpu.enums import Alphabet
        from dashing2_tpu.ops import kmers as KK
        from dashing2_tpu.ops import sketch_kernels as SK

        B, L, k = 64, 1 << 15, 31
        codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))

        def sk_step(c):
            hashed, valid = KK.hashed_kmers(
                c, k, w=k, canonicalize=True, alphabet=Alphabet.DNA,
                xormask=HH.XORMASK, seed_is_zero=False, entropy_min=False)
            regs, _ = SK.oph_sketch_rows(hashed, valid, m=m,
                                         want_counts=False)
            return c ^ (regs[0, 0] & jnp.uint64(0xFF)).astype(jnp.uint8)

        def make_sk(K):
            @jax.jit
            def run(c):
                def body(s, _):
                    return sk_step(s), None
                s2, _ = jax.lax.scan(body, c, None, length=K)
                return s2[0, 0]
            return run
        ts1 = timed(make_sk(1), codes, reps=2)
        ts5 = timed(make_sk(5), codes, reps=2)
        per_sk = max((ts5 - ts1) / 4, 1e-9)
        print(f"# device sketch rate (encode+hash+OPH m={m}): "
              f"{B * L / per_sk / 1e9:.2f} Gbase/s", file=sys.stderr)
    except Exception as e:
        print(f"# sketch-rate metric failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "pairwise_comparisons_per_sec",
        "value": round(pps, 1),
        "unit": "unique pairs/s (m=1024 f64 registers, full gtlt "
                "estimator inputs, one chip, circulant self-pairs kernel)",
        "vs_baseline": round(pps / BASELINE_CPU_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
