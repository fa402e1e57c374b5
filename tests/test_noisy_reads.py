"""Noisy-long-read robustness: mapper + assembler under nanopore-like
error rates (the simulator's error-free mode can hide threshold bugs)."""

import numpy as np

from muchsalsa_tpu.assemble.driver import assemble
from muchsalsa_tpu.config import MapperConfig
from muchsalsa_tpu.io.fasta import SequenceStore, write_fasta
from muchsalsa_tpu.pipeline.mapper import MinimizerIndex, map_all, write_paf
from muchsalsa_tpu.testing.simulate import add_noise, random_genome
from muchsalsa_tpu.utils.seq import reverse_complement
from tests.test_end_to_end import kmer_hit_fraction, read_contigs


def test_noisy_assembly(tmp_path):
    rng = np.random.default_rng(0)
    G = 40_000
    genome = random_genome(rng, G)

    unitigs = SequenceStore()
    pos = i = 0
    while pos + 1200 <= G:
        unitigs.add(f"unitig_{i}", genome[pos : pos + 1200])
        pos += 1450
        i += 1

    reads = SequenceStore()
    for r in range(int(12 * G / 6000)):
        s = int(rng.integers(0, G - 6000))
        seq = add_noise(rng, genome[s : s + 6000], 0.07)
        if rng.integers(0, 2):
            seq = reverse_complement(seq)
        reads.add(f"read_{r}", seq)

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    lines = map_all(
        index, reads, cfg,
        unitig_names=lambda u: unitigs.registry.name(u),
        read_names=lambda r: reads.registry.name(r),
    )
    assert len(lines) > 50

    write_fasta(tmp_path / "u.fa", ((unitigs.registry.name(j), unitigs.sequence(j)) for j in unitigs.ids()))
    write_fasta(tmp_path / "r.fa", ((reads.registry.name(j), reads.sequence(j)) for j in reads.ids()))
    write_paf(lines + ["s\t1\t0\t1\t+\ts\t1\t0\t1\t0\t1\t0"], tmp_path / "m.paf")

    assemble(tmp_path / "m.paf", tmp_path / "u.fa", tmp_path / "r.fa", tmp_path / "out")
    contigs = read_contigs(tmp_path / "out" / "temp_1.target.fa")
    assert contigs
    total = sum(len(c) for c in contigs.values())
    assert total > 0.5 * G
    # unpolished output: anchors are exact, gap fill carries read noise
    for name, c in contigs.items():
        assert kmer_hit_fraction(c, genome) > 0.5, name


def test_add_noise_rate():
    rng = np.random.default_rng(1)
    s = random_genome(rng, 50_000)
    noisy = add_noise(rng, s, 0.1)
    # length roughly preserved (ins/del balance)
    assert abs(len(noisy) - len(s)) < 0.02 * len(s)
    diff = sum(1 for a, b in zip(noisy, s) if a != b)
    assert diff > 0.02 * len(s)
    assert add_noise(rng, s, 0.0) == s
