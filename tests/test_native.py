"""Native C++ runtime vs pure-Python paths (skipped without a toolchain)."""

import numpy as np
import pytest

from muchsalsa_tpu import native
from muchsalsa_tpu.io.fasta import SequenceStore
from muchsalsa_tpu.io.paf import read_paf
from muchsalsa_tpu.testing.simulate import random_genome, simulate, write_simulation
from muchsalsa_tpu.utils.seq import reverse_complement

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_native_revcomp():
    rng = np.random.default_rng(0)
    s = random_genome(rng, 10_001)
    assert native.revcomp(s) == reverse_complement(s)
    assert native.revcomp(b"ANnT") == b"AnNT"
    assert native.revcomp(b"") == b""


def test_native_paf_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    sim = simulate(rng, genome_length=40_000, coverage=8.0)
    paths = write_simulation(sim, tmp_path)

    py = read_paf(paths["paf"], use_native=False)
    nat = read_paf(paths["paf"], use_native=True)

    assert native.available()
    for field in (
        "illu_id", "nano_id", "illu_start", "illu_end", "nano_start",
        "nano_end", "nano_length", "direction", "score", "is_primary", "line_idx",
    ):
        np.testing.assert_array_equal(
            getattr(py, field), getattr(nat, field), err_msg=field
        )
    assert py.registry_nanopore.names() == nat.registry_nanopore.names()
    assert py.registry_illumina.names() == nat.registry_illumina.names()


def test_native_fasta_matches_python(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">r1 desc\nACGT\nacgt\n>r2\nTT TT\n>empty\n>r3\nGGGG\n")
    py = SequenceStore()
    py.load(p, use_native=False)
    nat = SequenceStore()
    nat.load(p, use_native=True)
    assert py.registry.names() == nat.registry.names()
    for i in py.ids():
        assert py.sequence(i) == nat.sequence(i), py.registry.name(i)


def test_native_fastq_matches_python(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1 extra\nACGTA\n+\nIIIII\n@r2\nGGCC\n+junk\n!!!!\n")
    py = SequenceStore()
    py.load(p, use_native=False)
    nat = SequenceStore()
    nat.load(p, use_native=True)
    assert py.registry.names() == nat.registry.names()
    for i in py.ids():
        assert py.sequence(i) == nat.sequence(i)


def test_native_kmer_count_matches_python():
    import os

    import numpy as np

    from muchsalsa_tpu import native
    from muchsalsa_tpu.pipeline import kmer
    from muchsalsa_tpu.testing.simulate import random_genome

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    seqs = [random_genome(rng, int(rng.integers(10, 400))) for _ in range(50)]
    seqs.append(b"ACGTNNNACGTACGTACGTNACGTACGTACGTACGT")  # invalid bases
    seqs.append(b"AC")  # shorter than k

    for k in (15, 21, 31):
        got = native.count_kmers_native(seqs, k)
        os.environ["MS_TPU_NO_NATIVE"] = "1"
        try:
            # python reference path (native module already loaded, so
            # gate through the pure-python code directly)
            chunks = []
            from muchsalsa_tpu.utils.seq import encode_2bit

            for seq in seqs:
                vals, valid = kmer.kmer_values64(encode_2bit(seq), k)
                if len(vals):
                    chunks.append(vals[valid])
            allv = np.concatenate(chunks)
            uniq, counts = np.unique(allv, return_counts=True)
        finally:
            del os.environ["MS_TPU_NO_NATIVE"]
        np.testing.assert_array_equal(got[0], uniq)
        np.testing.assert_array_equal(got[1], counts.astype(np.int64))


def test_native_filter_pairs_matches_python():
    import numpy as np

    from muchsalsa_tpu import native
    from muchsalsa_tpu.pipeline.kmer import kmer_values64
    from muchsalsa_tpu.testing.simulate import random_genome
    from muchsalsa_tpu.utils.seq import encode_2bit

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(6)
    k = 15
    pairs = [
        (random_genome(rng, 100), random_genome(rng, 100)) for _ in range(200)
    ]
    # bad k-mers drawn from some reads so the filter actually fires
    bad = []
    for a, b in pairs[::7]:
        v, ok = kmer_values64(encode_2bit(a), k)
        bad.append(v[ok][0])
    bad_sorted = np.sort(np.asarray(bad, dtype=np.uint64))

    keep = native.filter_pairs_native(pairs, bad_sorted, k)

    def is_clean(seq):
        vals, valid = kmer_values64(encode_2bit(seq), k)
        vals = vals[valid]
        pos = np.minimum(np.searchsorted(bad_sorted, vals), len(bad_sorted) - 1)
        return not bool(np.any(bad_sorted[pos] == vals))

    expected = [is_clean(a) and is_clean(b) for a, b in pairs]
    assert keep.tolist() == expected
    assert not all(expected)  # the filter fired


def test_native_unitigs_match_python():
    import numpy as np

    from muchsalsa_tpu import native
    from muchsalsa_tpu.pipeline.dbg import UnitigBuilder
    from muchsalsa_tpu.testing.simulate import random_genome

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    genome = random_genome(rng, 4000)
    # overlapping error-free fragments, 2x so min_count=2 keeps them
    seqs = []
    for rep in range(2):
        for s in range(0, 3800, 90):
            seqs.append(genome[s : s + 200])

    b = UnitigBuilder(seqs, k=31, min_count=2)
    got = native.build_unitigs_native(
        np.ascontiguousarray(b._kmers_sorted, dtype=np.uint64), 31, 500
    )

    # python walk on the same k-mer set
    expected = []
    k = b.k
    visited = set()
    km = b.kmers
    from muchsalsa_tpu.pipeline.dbg import _canon

    DECODE = b"ACGT"
    mask = (1 << (2 * k)) - 1

    def extensions(v, forward):
        out = []
        for bb in range(4):
            nxt = ((v << 2) | bb) & mask if forward else (v >> 2) | (bb << (2 * (k - 1)))
            if _canon(nxt, k) in km:
                out.append(nxt)
        return out

    for start in sorted(km):
        if start in visited:
            continue
        visited.add(start)

        def walk(v, forward):
            path = []
            cur = v
            while True:
                exts = extensions(cur, forward)
                if len(exts) != 1:
                    break
                nxt = exts[0]
                c = _canon(nxt, k)
                if c in visited or c == _canon(cur, k):
                    break
                if len(extensions(nxt, not forward)) != 1:
                    break
                path.append(nxt)
                visited.add(c)
                cur = nxt
            return path

        fwd = walk(start, True)
        bwd = walk(start, False)
        chain = list(reversed(bwd)) + [start] + fwd
        seq = bytearray()
        first = chain[0]
        for i in range(k):
            seq.append(DECODE[(first >> (2 * (k - 1 - i))) & 3])
        for v in chain[1:]:
            seq.append(DECODE[v & 3])
        if len(seq) >= 500:
            expected.append(bytes(seq))

    assert got == expected
    assert len(got) >= 1


def test_native_index_build_matches_python():
    import numpy as np

    from muchsalsa_tpu import native
    from muchsalsa_tpu.config import MapperConfig
    from muchsalsa_tpu.io.fasta import SequenceStore
    from muchsalsa_tpu.ops.minimizer import minimizers
    from muchsalsa_tpu.testing.simulate import random_genome

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(8)
    store = SequenceStore()
    dup = random_genome(rng, 300)
    for i in range(40):
        store.add(f"s{i}", random_genome(rng, int(rng.integers(20, 600))))
    for i in range(12):  # force repeat buckets beyond max_occ
        store.add(f"d{i}", dup)

    cfg = MapperConfig()
    from muchsalsa_tpu.pipeline.mapper import MinimizerIndex

    got = MinimizerIndex.build(store, cfg)

    # python reference: precomputed sketches force the python path
    sketches = {
        uid: minimizers(seq, cfg.k, cfg.w) for uid, seq in store.items()
    }
    ref = MinimizerIndex.build(store, cfg, sketches=sketches)

    np.testing.assert_array_equal(got.hashes, ref.hashes)
    np.testing.assert_array_equal(got.offsets, ref.offsets)
    np.testing.assert_array_equal(got.entry_unitig, ref.entry_unitig)
    np.testing.assert_array_equal(got.entry_pos, ref.entry_pos)
    np.testing.assert_array_equal(got.entry_strand, ref.entry_strand)
    assert got.unitig_lengths == ref.unitig_lengths


def test_pack_reads_2bit_matches_numpy():
    """Native one-pass batch pack == pack_codes(encode_2bit(...)) over
    the padded (R, L) batch, including pad rows and non-ACGT bases."""
    import numpy as np
    import pytest

    from muchsalsa_tpu import native
    from muchsalsa_tpu.ops.mapping_jax import pack_codes
    from muchsalsa_tpu.utils.seq import encode_2bit

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    L = 1024
    seqs = []
    for n in (0, 1, 31, 32, 500, 1024):
        s = rng.choice(list(b"ACGTNacgtn"), size=n).astype(np.uint8).tobytes()
        seqs.append(s)
    R = len(seqs) + 2  # two pad rows
    got = native.pack_reads_2bit(seqs, L, n_rows=R)
    assert got is not None
    packed_n, nmask_n, lens_n = got

    codes = np.full((R, L), 4, dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encode_2bit(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    packed_e, nmask_e = pack_codes(codes)
    np.testing.assert_array_equal(packed_n, packed_e)
    np.testing.assert_array_equal(nmask_n, nmask_e)
    np.testing.assert_array_equal(lens_n, lens)
