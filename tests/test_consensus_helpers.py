"""Unit tests for consensus primitives (ap.cpp helpers)."""

import numpy as np

from muchsalsa_tpu.assemble.consensus import (
    ChunkedSeq,
    get_anchor_cliques,
    ramsey_r2,
    update_consensus_base,
)
from muchsalsa_tpu.graph.graph import Graph, VertexInfo


def test_update_consensus_base_initial():
    seq, lo, hi = update_consensus_base(None, (0, 0), "ACGT", (5, 8))
    assert (seq.materialize(), lo, hi) == ("ACGT", 5, 8)


def test_update_consensus_base_right_extension():
    # old covers [0,3]; new covers [2,7] -> append new's last 4 chars
    seq, lo, hi = update_consensus_base(ChunkedSeq("AAAA"), (0, 3), "CCTTTT", (2, 7))
    assert seq.materialize() == "AAAA" + "TTTT"
    assert (lo, hi) == (0, 7)


def test_update_consensus_base_left_extension_has_reference_offby1():
    # old covers [4,7]; new covers [0,5] -> prefix = new[0:4], but the
    # reference's strSlice keeps [0, borderRight] INCLUSIVE: 5 chars
    seq, lo, hi = update_consensus_base(ChunkedSeq("GGGG"), (4, 7), "AACCTT", (0, 5))
    assert seq.materialize() == "AACCT" + "GGGG"  # one duplicated boundary char
    assert (lo, hi) == (0, 7)


def test_update_consensus_base_interior_never_rewritten():
    seq, lo, hi = update_consensus_base(ChunkedSeq("AAAA"), (0, 3), "TT", (1, 2))
    assert seq.materialize() == "AAAA"
    assert (lo, hi) == (0, 3)


def test_chunked_seq_ops():
    s = ChunkedSeq("MIDDLE")
    s.prepend("LEFT_")
    s.append("_RIGHT")
    assert len(s) == len("LEFT_MIDDLE_RIGHT")
    assert s.prefix(4) == "LEFT"
    assert s.suffix(5) == "RIGHT"
    assert s.prefix(100) == "LEFT_MIDDLE_RIGHT"
    assert s.suffix(100) == "LEFT_MIDDLE_RIGHT"
    assert s.materialize() == "LEFT_MIDDLE_RIGHT"
    # chunked new_seq as extension source
    out, lo, hi = update_consensus_base(ChunkedSeq("XX"), (5, 6), s, (0, 8))
    assert out.materialize() == s.materialize()[:6] + "XX"


def _clique_graph(edges, n):
    g = Graph()
    for i in range(n):
        g.add_vertex(VertexInfo(i))
    for u, v in edges:
        g.add_edge(u, v)
    return g


def test_ramsey_r2_finds_clique():
    # triangle 0-1-2 plus isolated-ish 3
    g = _clique_graph([(0, 1), (0, 2), (1, 2), (2, 3)], 4)
    clique = ramsey_r2(g, [0, 1, 2, 3])
    assert set(clique) <= {0, 1, 2, 3}
    for a in clique:
        for b in clique:
            assert a == b or g.has_edge(a, b)
    assert len(clique) == 3


def test_get_anchor_cliques_cover_all_vertices():
    g = _clique_graph([(0, 1), (2, 3)], 5)
    cliques = get_anchor_cliques(g, [0, 1, 2, 3, 4])
    covered = [v for c in cliques for v in c]
    assert sorted(covered) == [0, 1, 2, 3, 4]
    # each clique internally complete
    for c in cliques:
        for a in c:
            for b in c:
                assert a == b or g.has_edge(a, b)


def test_get_anchor_cliques_single_vertex():
    g = _clique_graph([], 1)
    assert get_anchor_cliques(g, [0]) == [[0]]
