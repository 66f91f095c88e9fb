"""Generate small synthetic FASTA fixtures with controlled overlap."""

import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(rng, n):
    return rng.choice(BASES, size=n).tobytes()


def mutate(rng, seq: bytes, rate: float) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    nmut = int(len(arr) * rate)
    pos = rng.choice(len(arr), size=nmut, replace=False)
    arr[pos] = rng.choice(BASES, size=nmut)
    return arr.tobytes()


def write_fasta(path, records):
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            s = seq.decode()
            for i in range(0, len(s), 80):
                f.write(s[i:i + 80] + "\n")


def make(outdir, n_genomes=8, length=20000, seed=42):
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = random_genome(rng, length)
    paths = []
    for i in range(n_genomes):
        rate = min(0.002 * i, 0.4)  # increasing divergence, capped
        seq = mutate(rng, base, rate) if i else base
        p = os.path.join(outdir, f"g{i}.fa")
        write_fasta(p, [(f"genome{i}", seq)])
        paths.append(p)
    return paths


if __name__ == "__main__":
    import sys
    print("\n".join(make(sys.argv[1] if len(sys.argv) > 1 else "fixtures")))
