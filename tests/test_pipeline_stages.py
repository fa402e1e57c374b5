"""K-mer filter, de Bruijn unitigs, unitig filter, scrubber."""

import numpy as np

from muchsalsa_tpu.config import MapperConfig, ScrubConfig
from muchsalsa_tpu.io.fasta import SequenceStore
from muchsalsa_tpu.pipeline.dbg import build_unitigs
from muchsalsa_tpu.pipeline.kmer import (
    abundance_threshold,
    count_kmers,
    filter_read_pairs,
    high_abundance_kmers,
    histogram,
    kmer_values64,
)
from muchsalsa_tpu.pipeline.mapper import MinimizerIndex, map_all
from muchsalsa_tpu.pipeline.scrubber import build_anchor_graph, scrub_reads
from muchsalsa_tpu.pipeline.unitig_filter import filter_unitigs
from muchsalsa_tpu.testing.simulate import random_genome
from muchsalsa_tpu.utils.seq import encode_2bit, reverse_complement


def test_kmer_values64_canonical():
    vals, valid = kmer_values64(encode_2bit(b"ACGTA"), 3)
    vals_rc, _ = kmer_values64(encode_2bit(reverse_complement(b"ACGTA")), 3)
    assert sorted(vals.tolist()) == sorted(vals_rc.tolist())
    assert valid.all()


def test_count_and_threshold():
    # sequence with one highly repeated k-mer region
    seqs = [b"ACGTACGTACGTACGTACGT", b"TTTTTTTTTTTTTTTT"]
    uniq, counts = count_kmers(seqs, 5)
    h = histogram(counts)
    assert sum(h.values()) == len(uniq)
    th = abundance_threshold(h)
    assert th >= 0
    bad = high_abundance_kmers(uniq, counts, max(int(counts.max()), 2))
    assert len(bad) >= 1


def test_filter_read_pairs():
    rng = np.random.default_rng(0)
    clean = random_genome(rng, 100)
    dirty = b"A" * 50  # poly-A k-mer will be "bad"
    uniq, counts = count_kmers([dirty] * 5, 25)
    bad = high_abundance_kmers(uniq, counts, 2)
    kept = filter_read_pairs([(clean, clean), (dirty, clean)], bad, 25)
    assert (clean, clean) in kept
    assert (dirty, clean) not in kept


def test_dbg_unitigs_reconstruct_genome():
    rng = np.random.default_rng(42)
    genome = random_genome(rng, 3000)
    # error-free 150bp reads tiling the genome densely on both strands
    reads = []
    for start in range(0, len(genome) - 150, 25):
        r = genome[start : start + 150]
        reads.append(r if (start // 25) % 2 == 0 else reverse_complement(r))
    unitigs = build_unitigs(reads * 2, k=31, min_count=2, min_length=500)
    assert unitigs, "no unitigs built"
    ref = genome + b"#" + reverse_complement(genome)
    total = 0
    for u in unitigs:
        assert u in ref or reverse_complement(u) in ref, "unitig not genomic"
        total += len(u)
    assert total > 0.8 * len(genome)


def paf_line(q, qlen, qs, qe, t, tlen, ts, te, strand="+", nm=600):
    return f"{q}\t{qlen}\t{qs}\t{qe}\t{strand}\t{t}\t{tlen}\t{ts}\t{te}\t{nm}\t{nm}\t60"


def test_filter_unitigs_passthrough_and_cut():
    # eight normal unitigs (coverage 2); u_rep has a high-coverage peak
    lines = []
    for u in range(8):
        for i in range(2):
            lines.append(paf_line(f"u_norm{u}", 3000, 0, 3000, f"r{u}_{i}", 9000, 0, 3000))
    for i in range(50):
        lines.append(paf_line("u_rep", 4000, 1500, 2500, f"q{i}", 9000, 0, 1000))
    for i in range(2):
        lines.append(paf_line("u_rep", 4000, 0, 4000, f"s{i}", 9000, 0, 4000))
    seqs = {f"u_norm{u}": b"A" * 3000 for u in range(8)}
    seqs["u_rep"] = b"C" * 4000
    out, stats = filter_unitigs(lines, seqs)
    names = [n.split()[0] for n, _ in out]
    assert "u_norm0" in names
    assert stats.outlier_count == 1
    # the repeat unitig is cut into flank fragments below the peak
    frags = [(n, s) for n, s in out if n.startswith("u_rep_")]
    assert len(frags) >= 1
    for n, s in frags:
        assert len(s) >= 500


def test_anchor_graph_edges():
    lines = [
        paf_line("u1", 2000, 0, 1000, "rA", 8000, 0, 1000),
        paf_line("u1", 2000, 0, 1000, "rB", 8000, 500, 1500),
        paf_line("u2", 2000, 0, 1000, "rC", 8000, 0, 1000),
        paf_line("u2", 2000, 0, 300, "rD", 8000, 0, 300),  # < 500bp hit: dropped
    ]
    nodes, adj = build_anchor_graph(lines)
    assert set(nodes) == {"rA", "rB", "rC"}
    assert "rB" in adj["rA"] and "rA" in adj["rB"]
    assert not adj["rC"]


def test_anchor_graph_matches_reference_grouping_on_query_grouped_input():
    """Pin the parity scope of the anchor-id keying (round-4 advisor):
    on query-grouped line order — minimap2's output order, which the
    reference's consecutive-run grouping (scrubber_bfs.py:57-114)
    assumes — our anchor-id-keyed graph must equal the graph the
    reference grouping would build."""
    rng = np.random.default_rng(42)
    # random anchor->reads incidence, emitted query-grouped
    anchors = [f"u{a}" for a in range(12)]
    lines = []
    membership: dict[str, list[str]] = {}
    for a in anchors:
        readset = sorted(
            {f"r{int(x)}" for x in rng.integers(0, 30, rng.integers(1, 6))})
        membership[a] = readset
        for r in readset:
            lines.append(
                paf_line(a, 2000, 0, 1000, r, 9000, 100, 1100))

    def reference_grouping(paf_lines):
        """The reference's algorithm: chunk CONSECUTIVE lines by col 0,
        clique each chunk (scrubber_bfs.py:57-114)."""
        adj: dict[str, set[str]] = {}
        run_key, run_nodes = None, []
        def flush():
            for x in run_nodes:
                adj.setdefault(x, set())
                for y in run_nodes:
                    if x != y:
                        adj[x].add(y)
        for line in paf_lines:
            c = line.split("\t")
            if c[0] != run_key:
                flush()
                run_key, run_nodes = c[0], []
            run_nodes.append(c[5])
        flush()
        return adj

    _nodes, adj = build_anchor_graph(lines)
    ref_adj = reference_grouping(lines)
    assert {k: v for k, v in adj.items()} == {
        k: v for k, v in ref_adj.items()}

    # on interleaved (non-grouped) order the reference grouping loses
    # edges while the anchor-id keying keeps the same graph — the
    # intended, documented deviation
    shuffled = list(lines)
    rng.shuffle(shuffled)
    _n2, adj_shuf = build_anchor_graph(shuffled)
    assert adj_shuf == adj


def test_scrub_reads_trims_to_covered_spans():
    rng = np.random.default_rng(7)
    genome = random_genome(rng, 12_000)
    reads = SequenceStore()
    # three overlapping reads; junk tails on read B beyond any coverage
    a = genome[0:5000]
    b = genome[3000:9000] + random_genome(np.random.default_rng(1), 3000)
    c = genome[7000:12000]
    reads.add("rA", a)
    reads.add("rB", b)
    reads.add("rC", c)

    # anchors: unitigs at known positions, PAF in ground-truth coords
    lines = [
        paf_line("u1", 1000, 0, 1000, "rA", len(a), 3500, 4500),
        paf_line("u1", 1000, 0, 1000, "rB", len(b), 500, 1500),
        paf_line("u2", 1000, 0, 1000, "rB", len(b), 4500, 5500),
        paf_line("u2", 1000, 0, 1000, "rC", len(c), 500, 1500),
    ]
    out = scrub_reads(lines, reads, ScrubConfig(subset_size=10), MapperConfig())
    names = {n.split("_")[0] for n, _ in out}
    assert names == {"rA", "rB", "rC"}
    for name, seq in out:
        if name.startswith("rB"):
            # junk tail (last 3000bp of B) must be trimmed away
            assert len(seq) < len(b) - 2000
            assert seq in genome or reverse_complement(seq) in genome


def test_scrubbed_output_feeds_mapper():
    rng = np.random.default_rng(3)
    genome = random_genome(rng, 10_000)
    reads = SequenceStore()
    reads.add("r0", genome[0:6000])
    reads.add("r1", genome[4000:10000])
    lines = [
        paf_line("u1", 1000, 0, 1000, "r0", 6000, 4200, 5200),
        paf_line("u1", 1000, 0, 1000, "r1", 6000, 200, 1200),
    ]
    out = scrub_reads(lines, reads, ScrubConfig(subset_size=5), MapperConfig())
    assert out


def test_scrub_multiple_subsets():
    """Force several BFS rounds (subset_size=2) with center eviction."""
    rng = np.random.default_rng(21)
    genome = random_genome(rng, 30_000)
    reads = SequenceStore()
    lines = []
    # chain of 8 overlapping reads, each sharing an anchor with the next
    for i in range(8):
        s = i * 3000
        reads.add(f"r{i}", genome[s : s + 6000])
    for i in range(7):
        a_s = i * 3000 + 2500
        lines.append(
            paf_line(f"u{i}", 1000, 0, 1000, f"r{i}", 6000, 2500, 3500)
        )
        lines.append(
            paf_line(f"u{i}", 1000, 0, 1000, f"r{i+1}", 6000, 0, 1000)
        )
    out = scrub_reads(lines, reads, ScrubConfig(subset_size=2), MapperConfig())
    names = {n.split("_")[0] for n, _ in out}
    # every read eventually becomes a center and is emitted
    assert names == {f"r{i}" for i in range(8)}


def test_scrub_sharded_matches_single():
    """The per-subset overlap step sharded over N 'processes' (records
    exchanged through an allgather) must reproduce the single-process
    output exactly — the collective-merge leg of the streaming scrub
    (reference scrubber_bfs.py:163-248, SURVEY.md §2.5)."""
    rng = np.random.default_rng(21)
    genome = random_genome(rng, 30_000)
    reads = SequenceStore()
    lines = []
    for i in range(8):
        s = i * 3000
        reads.add(f"r{i}", genome[s : s + 6000])
    for i in range(7):
        lines.append(paf_line(f"u{i}", 1000, 0, 1000, f"r{i}", 6000, 2500, 3500))
        lines.append(paf_line(f"u{i}", 1000, 0, 1000, f"r{i+1}", 6000, 0, 1000))

    scfg, mcfg = ScrubConfig(subset_size=2), MapperConfig()
    single = scrub_reads(lines, reads, scfg, mcfg)

    # emulate the synchronous collective: every "process" contributes
    # its round-robin share of subsets, the gather returns the union
    from muchsalsa_tpu.pipeline.scrubber import (
        _subset_overlap_records, _subset_schedule, build_anchor_graph)

    nodes, adj = build_anchor_graph(lines, scfg.min_hit_length)
    schedule = _subset_schedule(nodes, adj, scfg.subset_size)
    assert len(schedule) >= 3, "fixture must span several subsets"

    def fake_allgather(local, n=3):
        mine = {i for i, _ in local}
        merged = list(local)
        for i, (subset, _center) in enumerate(schedule):
            if i not in mine:
                merged.append(
                    (i, _subset_overlap_records(subset, reads, scfg, mcfg)))
        return merged

    for p in range(3):
        sharded = scrub_reads(
            lines, reads, scfg, mcfg,
            process_index=p, process_count=3, allgather=fake_allgather,
        )
        assert sharded == single, f"process {p} output diverged"
