import numpy as np
import jax.numpy as jnp
import pytest

from dashing2_tpu.enums import Alphabet
from dashing2_tpu.ops import kmers as K

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def kmer_code_py(s: str) -> int:
    v = 0
    for ch in s:
        v = (v << 2) | "ACGT".index(ch)
    return v


def revcomp(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def ref_kmers(seq: str, k: int, canon: bool):
    out = []
    for i in range(len(seq) - k + 1):
        sub = seq[i:i + k]
        if any(c not in "ACGT" for c in sub):
            out.append(None)
            continue
        v = kmer_code_py(sub)
        if canon:
            v = min(v, kmer_code_py(revcomp(sub)))
        out.append(v)
    return out


@pytest.mark.parametrize("k", [3, 5, 21, 31])
@pytest.mark.parametrize("canon", [False, True])
def test_dna_kmer_codes_match_python(k, canon):
    rng = np.random.default_rng(k)
    seq = "".join(rng.choice(list("ACGT"), size=200))
    seq = seq[:57] + "N" + seq[58:]  # inject an invalid base
    codes = K.encode_ascii(seq.encode(), Alphabet.DNA)
    km, valid = K.dna_kmer_codes(jnp.asarray(codes)[None, :], k, canon)
    km = np.asarray(km)[0]
    valid = np.asarray(valid)[0]
    want = ref_kmers(seq, k, canon)
    assert len(want) == len(km)
    for i, wv in enumerate(want):
        if wv is None:
            assert not valid[i], i
        else:
            assert valid[i], i
            assert int(km[i]) == wv, (i, seq[i:i+k])


def test_encode_ascii_case_insensitive():
    a = K.encode_ascii(b"acgtACGTnN", Alphabet.DNA)
    assert list(a[:4]) == [0, 1, 2, 3]
    assert list(a[4:8]) == [0, 1, 2, 3]
    assert a[8] == K.INVALID and a[9] == K.INVALID


def test_protein_alphabets_pack():
    for alph in (Alphabet.PROTEIN20, Alphabet.PROTEIN_6, Alphabet.PROTEIN_14,
                 Alphabet.PROTEIN_3BIT):
        lut = K.alphabet_lut(alph)
        sz = K.alphabet_size(alph)
        valid_codes = lut[lut != K.INVALID]
        assert valid_codes.max() == sz - 1
        seq = b"ACDEFGHIKLMNPQRSTVWY" * 2
        codes = K.encode_ascii(seq, alph)
        km, valid = K.base_b_kmer_codes(jnp.asarray(codes)[None, :], 5, sz)
        assert np.asarray(valid).all()
        # spot-check first kmer
        want = 0
        for c in codes[:5]:
            want = want * sz + int(c)
        assert int(np.asarray(km)[0, 0]) == want


def test_chunking_covers_all_kmers_exactly_once():
    """Chunked extraction + the PRODUCTION ownership mask must emit each
    k-mer exactly once (multiset equality with per-sequence extraction).
    The mask is applied here exactly as _hash_chunk_batch does — an
    earlier version of this test skipped it and missed an ownership bug
    that dropped k-1 k-mers at every chunk boundary."""
    rng = np.random.default_rng(3)
    k = 11
    cl = 256
    seqs = ["".join(rng.choice(list("ACGT"), size=n)) for n in (50, 300, 997)]
    code_arrays = [K.encode_ascii(s.encode(), Alphabet.DNA) for s in seqs]
    chunks, _ = K.chunk_codes(code_arrays, k=k, chunk_len=cl)
    km, valid = K.dna_kmer_codes(jnp.asarray(chunks), k, False)
    lo, hi = K.owned_kmer_range(k, 0, cl)
    pos = np.arange(km.shape[-1])
    owned = np.asarray(valid) & (pos >= lo) & (pos < hi)
    got = np.asarray(km)[owned]
    want = []
    for s in seqs:
        want.extend(v for v in ref_kmers(s, k, False) if v is not None)
    # multiset equality
    assert sorted(got.tolist()) == sorted(want)


def test_sketch_chunk_size_invariance(tmp_path):
    """End-to-end: sketches and exact k-mer sets must not depend on the
    chunk length (regression: k-1 k-mers per interior chunk boundary
    were dropped by the ownership mask for sequences > chunk_len)."""
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.enums import KmerSketchResultType
    from dashing2_tpu.sketch.core import sketch_fastx

    rng = np.random.default_rng(17)
    p = str(tmp_path / "long.fa")
    with open(p, "w") as f:
        for i in range(2):
            seq = "".join(rng.choice(list("ACGT"), size=3001 + 700 * i))
            f.write(f">s{i}\n{seq}\n")
    ref = None
    for cl in (4096, 512, 300):
        opts = Dashing2Options(k=13, sketchsize=64,
                               kmer_result=KmerSketchResultType.FULL_MMER_SET)
        res = sketch_fastx(opts, [p], chunk_len=cl)
        kset = np.asarray(res.kmer_sets[0])
        opts2 = Dashing2Options(k=13, sketchsize=64)
        res2 = sketch_fastx(opts2, [p], chunk_len=cl)
        sigs = np.asarray(res2.signatures)
        if ref is None:
            ref = (kset, sigs)
        else:
            assert np.array_equal(ref[0], kset), cl
            assert np.array_equal(ref[1], sigs), cl


def test_minimizer_selection_chunk_invariant():
    """w>k selection through the production chunk geometry + ownership
    mask must equal the unchunked computation, including sequences with
    interior N-runs (regression: pad windows at sequence edges selected
    extra minimizers; windows are live only when ALL their k-mers are
    valid — the streaming reset semantics)."""
    rng = np.random.default_rng(45)
    for k, w, cl, L, withN in ((7, 12, 64, 500, False),
                               (7, 12, 64, 500, True),
                               (11, 31, 128, 1000, True)):
        seq = list(rng.choice(list("ACGT"), size=L))
        if withN:
            for p in rng.integers(0, L, size=L // 40):
                seq[p] = "N"
        codes = K.encode_ascii("".join(seq).encode(), Alphabet.DNA)
        km, valid = K.dna_kmer_codes(jnp.asarray(codes)[None, :], k, False)
        un = set(np.nonzero(
            np.asarray(K.minimizer_mask(km, valid, k, w))[0])[0].tolist())
        chunks, _ = K.chunk_codes([codes], k, chunk_len=cl, w=w)
        kmc, vc = K.dna_kmer_codes(jnp.asarray(chunks), k, False)
        selc = np.asarray(K.minimizer_mask(kmc, vc, k, w))
        lo, hi = K.owned_kmer_range(k, w, cl)
        pos = np.arange(kmc.shape[-1])
        owned = selc & (pos >= lo) & (pos < hi)
        ch = set(r * cl + (int(j) - lo)
                 for r in range(chunks.shape[0])
                 for j in np.nonzero(owned[r])[0])
        assert ch == un, (k, w, sorted(ch ^ un))


def test_window_minimizers_match_naive():
    rng = np.random.default_rng(9)
    k, w = 7, 15
    seq = "".join(rng.choice(list("ACGT"), size=400))
    codes = K.encode_ascii(seq.encode(), Alphabet.DNA)
    km, valid = K.dna_kmer_codes(jnp.asarray(codes)[None, :], k, False)
    sel = K.minimizer_mask(km, valid, k, w)
    got = set(np.nonzero(np.asarray(sel)[0])[0].tolist())
    # naive: for each window, leftmost argmin position
    kv = np.asarray(km)[0]
    nwin = w - k + 1
    want = set()
    for j in range(len(kv) - nwin + 1):
        win = kv[j:j + nwin]
        want.add(j + int(np.argmin(win)))
    assert got == want


def test_spaced_seeds():
    seq = b"ACGTACGTACGT"
    codes = K.encode_ascii(seq, Alphabet.DNA)
    offsets = K.parse_spacing("0,1,1,0", 5)  # pattern KK$K$KK -> span 7
    assert offsets == [0, 1, 3, 5, 6]
    km, valid = K.spaced_kmer_codes(jnp.asarray(codes)[None, :], offsets, 2)
    s = seq.decode()
    v0 = 0
    for off in offsets:
        v0 = (v0 << 2) | "ACGT".index(s[off])
    assert int(np.asarray(km)[0, 0]) == v0
    assert np.asarray(valid)[0, 0]


def test_hashed_kmers_pipeline():
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGT"), size=300))
    codes = jnp.asarray(K.encode_ascii(seq.encode(), Alphabet.DNA))[None, :]
    h, valid = K.hashed_kmers(codes, 21, canonicalize=True)
    from dashing2_tpu import hashing as H
    km, _ = K.dna_kmer_codes(codes, 21, True)
    assert np.array_equal(np.asarray(h), H.maskfn(np.asarray(km)))
    # seed 0 disables scrambling
    h0, _ = K.hashed_kmers(codes, 21, canonicalize=True, seed_is_zero=True)
    assert np.array_equal(np.asarray(h0), np.asarray(km))


def test_entropy_min_selects_fewer_lowcomplexity():
    # homopolymer runs should not dominate entmin selection
    seq = ("A" * 50 + "ACGTGTCAGTAC" * 10).encode()
    codes = jnp.asarray(K.encode_ascii(seq, Alphabet.DNA))[None, :]
    h_lex, v_lex = K.hashed_kmers(codes, 7, w=15)
    h_ent, v_ent = K.hashed_kmers(codes, 7, w=15, entropy_min=True)
    # both produce selections; entmin is a valid mask over same positions
    assert np.asarray(v_ent).sum() > 0
    assert np.asarray(v_lex).sum() > 0


def test_entmin_lowcomplexity_kmers_lose_windows():
    """Statistical check of the documented entmin deviation (README
    'Documented deviations'): the re-derived score hash/max(H, eps)
    must make low-entropy k-mers lose minimizer windows — selected
    positions under --entmin should have systematically HIGHER window
    entropy than under plain lexicographic selection on the same
    sequence."""
    rng = np.random.default_rng(7)
    k, w = 9, 19
    # homopolymer runs SHORTER than the window (every window containing
    # one still has complex alternatives, so the selector has a choice);
    # 'A'-runs are lexicographic minima, so plain selection favors them
    parts = []
    for i in range(60):
        parts.append("".join(rng.choice(list("ACGT"), size=30)))
        parts.append("A" * 12)
    seq = "".join(parts).encode()
    codes_np = np.asarray(K.encode_ascii(seq, Alphabet.DNA))
    codes = jnp.asarray(codes_np)[None, :]

    def kmer_entropy(pos):
        window = codes_np[pos:pos + k]
        ent = 0.0
        for b in range(4):
            p = (window == b).mean()
            if p > 0:
                ent -= p * np.log2(p)
        return ent

    _, v_lex = K.hashed_kmers(codes, k, w=w)
    _, v_ent = K.hashed_kmers(codes, k, w=w, entropy_min=True)
    sel_lex = np.flatnonzero(np.asarray(v_lex)[0])
    sel_ent = np.flatnonzero(np.asarray(v_ent)[0])
    e_lex = np.mean([kmer_entropy(p) for p in sel_lex])
    e_ent = np.mean([kmer_entropy(p) for p in sel_ent])
    # entmin selections must be clearly more complex on average, and
    # near-never zero-entropy, while lexicographic selection (A-runs are
    # minimal codes) picks homopolymers often
    assert e_ent > e_lex + 0.2, (e_ent, e_lex)
    z_lex = np.mean([kmer_entropy(p) < 1e-9 for p in sel_lex])
    z_ent = np.mean([kmer_entropy(p) < 1e-9 for p in sel_ent])
    assert z_lex > 0.05, z_lex
    assert z_ent < z_lex / 4, (z_ent, z_lex)
