import numpy as np
import pytest

from muchsalsa_tpu.io.fasta import SequenceStore, is_fastq, write_fasta
from muchsalsa_tpu.io.paf import read_paf
from muchsalsa_tpu.io.registry import Registry


def test_registry_interning():
    reg = Registry()
    assert reg["a"] == 0
    assert reg["b"] == 1
    assert reg["a"] == 0
    assert len(reg) == 2
    assert reg.name(1) == "b"
    assert "b" in reg and "c" not in reg


def test_is_fastq_extension_based():
    # anything not .fa/.fasta counts as FASTQ (SequenceAccessor.cpp:71-78)
    assert not is_fastq("x.fa")
    assert not is_fastq("x.FASTA")
    assert is_fastq("x.fq")
    assert is_fastq("x.fastq")
    assert is_fastq("x.txt")


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "seqs.fa"
    p.write_text(">read1 description here\nACGT\nACGT\n>read2\nTTTT\n")
    store = SequenceStore.from_file(p)
    r1 = store.registry.get("read1")
    r2 = store.registry.get("read2")
    assert store.sequence(r1) == b"ACGTACGT"
    assert store.sequence(r2) == b"TTTT"
    assert store.length(r1) == 8


def test_fastq_parsing(tmp_path):
    p = tmp_path / "reads.fq"
    p.write_text("@r1 extra\nACGTA\n+\nIIIII\n@r2\nGGCC\n+\n!!!!\n")
    store = SequenceStore.from_file(p)
    assert store.sequence(store.registry.get("r1")) == b"ACGTA"
    assert store.sequence(store.registry.get("r2")) == b"GGCC"


def test_write_fasta(tmp_path):
    p = tmp_path / "out.fa"
    write_fasta(p, [("c1", "A" * 70)], width=60)
    text = p.read_text()
    assert text == ">c1\n" + "A" * 60 + "\n" + "A" * 10 + "\n"


def _paf_line(q, qs, qe, strand, t, tlen, ts, te, nmatch):
    # qlen(1) and extra cols don't matter except count >= 10
    return f"{q}\t9999\t{qs}\t{qe}\t{strand}\t{t}\t{tlen}\t{ts}\t{te}\t{nmatch}\t100\t60"


def test_read_paf_filters_and_offsets(tmp_path):
    p = tmp_path / "aln.paf"
    lines = [
        _paf_line("u1", 100, 700, "+", "n1", 5000, 1000, 1600, 450),   # kept
        _paf_line("u1", 0, 300, "+", "n2", 4000, 0, 300, 450),         # illu len 300 < 400 -> dropped
        _paf_line("u2", 0, 600, "-", "n1", 5000, 100, 700, 399),       # matches < 400 -> dropped
        _paf_line("u2", 0, 600, "-", "n2", 4000, 50, 650, 600),        # kept, primary
        _paf_line("u3", 0, 450, "+", "n3", 3000, 0, 450, 420),         # kept, not primary (len<500)
        _paf_line("u9", 0, 999, "+", "n9", 9000, 0, 999, 999),         # LAST line: skipped by parity
    ]
    p.write_text("\n".join(lines) + "\n")
    rec = read_paf(p)
    assert len(rec) == 3
    # inclusive ends
    assert rec.illu_end[0] == 699
    assert rec.nano_end[0] == 1599
    # primary flags: row0 len=600>=500 but matches 450 < 500 -> not primary
    assert list(rec.is_primary) == [False, True, False]
    assert rec.line_idx.tolist() == [0, 3, 4]
    # skip_last_line=False picks up the final line
    rec2 = read_paf(p, skip_last_line=False)
    assert len(rec2) == 4
    # rratio
    np.testing.assert_allclose(rec.rratio[0], 600.0 / 600.0)


def test_read_paf_short_line_raises(tmp_path):
    p = tmp_path / "bad.paf"
    p.write_text("a\tb\tc\nlast\n")
    with pytest.raises(ValueError):
        read_paf(p)
