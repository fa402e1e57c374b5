"""Mapper -> assembler integration: no ground-truth PAF, the native
mapper replaces the reference's minimap2 anchoring stage entirely."""

import numpy as np

from muchsalsa_tpu.assemble.driver import assemble
from muchsalsa_tpu.config import MapperConfig
from muchsalsa_tpu.io.fasta import SequenceStore, write_fasta
from muchsalsa_tpu.pipeline.mapper import MinimizerIndex, map_all, write_paf
from muchsalsa_tpu.testing.simulate import simulate
from tests.test_end_to_end import kmer_hit_fraction, read_contigs


def test_mapper_feeds_assembler(tmp_path):
    rng = np.random.default_rng(31)
    sim = simulate(
        rng,
        genome_length=40_000,
        unitig_length=1_200,
        unitig_gap=250,
        read_length=5_000,
        coverage=10.0,
    )

    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, seq)

    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    lines = map_all(
        index, reads, cfg,
        unitig_names=lambda u: unitigs.registry.name(u),
        read_names=lambda r: reads.registry.name(r),
    )
    assert lines

    data = tmp_path / "data"
    data.mkdir()
    write_fasta(data / "unitigs.fa", sim.unitig_records())
    write_fasta(data / "reads.fa", sim.read_records())
    # sentinel line: core parser drops the last PAF line by parity
    write_paf(lines + ["s\t1\t0\t1\t+\ts\t1\t0\t1\t0\t1\t0"], data / "mapped.paf")

    outdir = tmp_path / "out"
    result = assemble(data / "mapped.paf", data / "unitigs.fa", data / "reads.fa", outdir)
    assert result["paths"] >= 1

    contigs = read_contigs(outdir / "temp_1.target.fa")
    assert contigs
    total = sum(len(c) for c in contigs.values())
    assert total > 0.5 * len(sim.genome)
    for name, contig in contigs.items():
        assert kmer_hit_fraction(contig, sim.genome) > 0.8, name
