"""End-to-end assembly of simulated data (reference lacks such tests —
SURVEY.md §4 notes zero kernel coverage; this is the golden-path check)."""

import numpy as np
import pytest

from muchsalsa_tpu.assemble.driver import assemble
from muchsalsa_tpu.testing.simulate import simulate, write_simulation
from muchsalsa_tpu.utils.seq import reverse_complement


def kmer_hit_fraction(contig: bytes, genome: bytes, k: int = 31, stride: int = 13) -> float:
    """Fraction of sampled contig k-mers present in genome (either strand)."""
    if len(contig) < k:
        return 0.0
    ref = genome + b"#" + reverse_complement(genome)
    hits = total = 0
    for i in range(0, len(contig) - k + 1, stride):
        total += 1
        if contig[i : i + k] in ref:
            hits += 1
    return hits / max(total, 1)


def read_contigs(path) -> dict[str, bytes]:
    contigs = {}
    name = None
    chunks: list[bytes] = []
    for line in path.read_bytes().split(b"\n"):
        if line.startswith(b">"):
            if name is not None:
                contigs[name] = b"".join(chunks)
            name = line[1:].decode()
            chunks = []
        else:
            chunks.append(line)
    if name is not None:
        contigs[name] = b"".join(chunks)
    return contigs


@pytest.mark.parametrize("seed,both_strands", [(7, False), (11, True), (42, True)])
def test_assemble_simulated_genome(tmp_path, seed, both_strands):
    rng = np.random.default_rng(seed)
    sim = simulate(
        rng,
        genome_length=30_000,
        unitig_length=1_200,
        unitig_gap=250,
        read_length=5_000,
        coverage=10.0,
        both_strands=both_strands,
    )
    paths = write_simulation(sim, tmp_path / "data")
    outdir = tmp_path / "out"

    result = assemble(paths["paf"], paths["unitigs"], paths["reads"], outdir)
    assert result["components"] >= 1

    contigs = read_contigs(outdir / "temp_1.target.fa")
    assert contigs, "no contigs emitted"

    total_len = sum(len(c) for c in contigs.values())
    # contigs should cover a decent share of the genome
    assert total_len > 0.5 * len(sim.genome)

    # and consist overwhelmingly of true genomic sequence
    for name, contig in contigs.items():
        frac = kmer_hit_fraction(contig, sim.genome)
        assert frac > 0.85, f"{name}: only {frac:.2%} genomic k-mers"

    # query/paf outputs exist and are structurally valid
    paf_lines = (outdir / "temp_1.align.paf").read_text().strip().split("\n")
    for line in [l for l in paf_lines if l]:
        cols = line.split("\t")
        assert len(cols) == 12
        assert cols[4] == "+"


def test_assemble_deterministic(tmp_path):
    rng = np.random.default_rng(5)
    sim = simulate(rng, genome_length=20_000, coverage=8.0)
    paths = write_simulation(sim, tmp_path / "data")

    out1 = tmp_path / "out1"
    out2 = tmp_path / "out2"
    assemble(paths["paf"], paths["unitigs"], paths["reads"], out1)
    assemble(paths["paf"], paths["unitigs"], paths["reads"], out2)

    for fname in ("temp_1.target.fa", "temp_1.query.fa", "temp_1.align.paf"):
        assert (out1 / fname).read_bytes() == (out2 / fname).read_bytes(), fname


def test_assemble_parallel_matches_sequential(tmp_path):
    """The per-path fan-out (reference main.cpp:303-310,645-657) must be
    byte-identical to the sequential loop, including record numbering."""
    rng = np.random.default_rng(13)
    # two strands + gaps tend to yield several components/paths
    sim = simulate(rng, genome_length=40_000, coverage=9.0, both_strands=True)
    paths = write_simulation(sim, tmp_path / "data")

    seq_out = tmp_path / "seq"
    par_out = tmp_path / "par"
    r1 = assemble(paths["paf"], paths["unitigs"], paths["reads"], seq_out, workers=1)
    r2 = assemble(paths["paf"], paths["unitigs"], paths["reads"], par_out, workers=4)
    assert r1["paths"] == r2["paths"]
    if r1["paths"] > 1:
        assert r2["timer"].counters["assembly_workers"] > 1
    for fname in ("temp_1.target.fa", "temp_1.query.fa", "temp_1.align.paf"):
        assert (seq_out / fname).read_bytes() == (par_out / fname).read_bytes(), fname


def test_assemble_heuristic_cluster_weights(tmp_path):
    """Force the >=150000-order heuristic cluster-weight path
    (lg.cpp:362-366 switch) end to end: contigs must still be genomic,
    matching the reference's behavior at scale."""
    import dataclasses

    from muchsalsa_tpu.config import Config

    rng = np.random.default_rng(23)
    sim = simulate(rng, genome_length=30_000, coverage=9.0, both_strands=True)
    paths = write_simulation(sim, tmp_path / "data")

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, linearize=dataclasses.replace(
            cfg.linearize, cluster_weight_exact_max_order=1))
    outdir = tmp_path / "out"
    result = assemble(paths["paf"], paths["unitigs"], paths["reads"], outdir,
                      cfg)
    assert result["paths"] >= 1
    contigs = read_contigs(outdir / "temp_1.target.fa")
    assert contigs
    for name, contig in contigs.items():
        assert kmer_hit_fraction(contig, sim.genome) > 0.85, name


def test_assemble_meshed_driver_matches_host(tmp_path):
    """The production driver auto-meshes phases ②/③ over all attached
    devices (8 virtual here); outputs must be byte-identical to the
    pure-host (use_device=False) run and the counters must show the mesh
    actually engaged (VERDICT r2 item 3)."""
    import dataclasses
    import json

    from muchsalsa_tpu.config import Config

    rng = np.random.default_rng(13)
    sim = simulate(rng, genome_length=20_000, coverage=8.0)
    paths = write_simulation(sim, tmp_path / "data")

    base = Config()
    host_cfg = dataclasses.replace(
        base, device=dataclasses.replace(base.device, use_device=False))

    out_mesh = tmp_path / "out_mesh"
    out_host = tmp_path / "out_host"
    assemble(paths["paf"], paths["unitigs"], paths["reads"], out_mesh,
             config=base, workers=1)
    assemble(paths["paf"], paths["unitigs"], paths["reads"], out_host,
             config=host_cfg, workers=1)

    for fname in ("temp_1.target.fa", "temp_1.query.fa", "temp_1.align.paf"):
        assert (out_mesh / fname).read_bytes() == (out_host / fname).read_bytes(), fname

    stats = json.loads((out_mesh / "assembly_stats.json").read_text())
    counters = stats.get("counters", stats)
    assert counters["mesh_devices"] == 8
    assert counters["edges_on_device"] == 1
    assert counters["chaining_on_device"] == 1
