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
