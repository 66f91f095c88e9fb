"""Round-5: per-phase + cProfile breakdown of the north-star job
(10240 x 50 kb, --fastcmp 0.5 --bbit-sigs) on the real chip.

Runs the invocation twice in one process (cold, then warm) and profiles
the WARM repeat — the compile-free wall VERDICT r4 item 2 asks us to cut.
Writes findings to stdout; run as
    python experiments/r5_ns_profile.py [n]
"""
import cProfile
import io as _io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    from make_fixtures import make
    import dashing2_tpu
    from dashing2_tpu import timing as T
    from dashing2_tpu.cli import main as climain
    d = os.environ.get("NS_FIXDIR", "/tmp/ns10k")
    fas = make(d, n_genomes=n, length=50000, seed=11)
    lst = os.path.join(d, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(fas) + "\n")
    out = os.path.join(d, "ns.bin")
    argv = ["sketch", "-k", "31", "-S", "1024", "--fastcmp", "0.5",
            "--bbit-sigs", "--binary-output", "--cmpout", out,
            "-F", lst, "-v"]
    for tag in ("cold", "warm"):
        T.reset_spans()
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        if tag == "warm":
            pr.enable()
        rc = climain(argv)
        if tag == "warm":
            pr.disable()
        dt = time.perf_counter() - t0
        assert rc == 0
        print(f"== {tag} wall: {dt:.2f} s at n={n}")
        print("   spans:", {k: round(v, 2)
                            for k, v in sorted(T.spans().items())})
        if tag == "warm":
            s = _io.StringIO()
            ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
            ps.print_stats(45)
            print(s.getvalue())
            s = _io.StringIO()
            ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
            ps.print_stats(30)
            print(s.getvalue())
        sys.stdout.flush()


if __name__ == "__main__":
    main()
