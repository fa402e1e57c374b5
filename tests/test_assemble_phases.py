"""Unit tests for graph-reduction phases: bitweight, MST, decycle,
components, orientation, linearization."""

from muchsalsa_tpu.assemble.linearize import (
    extract_paths,
    find_cluster_weights,
    find_cluster_weights_heuristic,
    find_conservation_path,
    linearize_graph,
    sort_reduction_by_weight,
)
from muchsalsa_tpu.assemble.spanning import (
    compute_bitweights,
    connected_components,
    decycle,
    max_span_tree,
)
from muchsalsa_tpu.graph.graph import DiGraph, Direction, EdgeOrder, Graph, VertexInfo


def order(start, end, direction=True, score=100, contained=False, primary=True, base=None):
    return EdgeOrder(
        start, end, 0.0, 0.0, contained, base if base is not None else start,
        score, (0,), direction, primary,
    )


def make_weighted_graph(edges):
    """edges: list of (u, v, weight, direction_bool)."""
    g = Graph()
    for u, v, *_ in edges:
        for vid in (u, v):
            if not g.has_vertex(vid):
                g.add_vertex(VertexInfo(vid, meta_line=vid))
    for u, v, w, d in edges:
        e = g.add_edge(u, v)
        e.orders.append(order(u, v, direction=d, score=w))
    return g


def test_compute_bitweights():
    g = make_weighted_graph([(0, 1, 42, True), (1, 2, 7, False)])
    # shadow edge with uniform order directions gets consensus but no weight
    e_shadow = g.get_edge(1, 2)
    e_shadow.shadow = True
    compute_bitweights(g)
    assert g.get_edge(0, 1).weight == 42
    assert g.get_edge(0, 1).consensus_direction == Direction.POS
    assert e_shadow.weight == 0.0
    assert e_shadow.consensus_direction == Direction.NEG
    # shadow with conflicting directions -> no consensus
    g2 = make_weighted_graph([(0, 1, 5, True)])
    e = g2.get_edge(0, 1)
    e.shadow = True
    e.orders.append(order(0, 1, direction=False))
    compute_bitweights(g2)
    assert e.consensus_direction == Direction.NONE


def test_max_span_tree():
    # square with diagonal: keep heaviest edges that don't close cycles
    g = make_weighted_graph(
        [(0, 1, 10, True), (1, 2, 9, True), (2, 3, 8, True), (3, 0, 1, True), (0, 2, 5, True)]
    )
    compute_bitweights(g)
    tree = max_span_tree(g)
    kept = {(e.v, e.w) for e in tree.edges()}
    assert kept == {(0, 1), (1, 2), (2, 3)}


def test_decycle_removes_inconsistent_cycle_edge():
    # triangle where going around flips orientation inconsistently
    g = make_weighted_graph([(0, 1, 10, True), (1, 2, 9, True), (0, 2, 2, False)])
    compute_bitweights(g)
    tree = max_span_tree(g)
    deletable = decycle(g, tree)
    # the (0,2) edge disagrees: POS*POS != NEG; low weight -> both candidates
    labels = {(e.v, e.w) for e in deletable}
    assert (0, 2) in labels
    assert len(deletable) >= 1


def test_connected_components_consensus_only():
    g = make_weighted_graph([(0, 1, 5, True), (2, 3, 5, True), (1, 2, 5, True)])
    compute_bitweights(g)
    # cut the middle link by removing consensus
    g.get_edge(1, 2).consensus_direction = Direction.NONE
    comps = connected_components(g)
    as_sets = [set(c) for c in comps]
    assert {0, 1} in as_sets and {2, 3} in as_sets


def make_digraph(edges, weights=None):
    d = DiGraph()
    ids = sorted({v for e in edges for v in e})
    for vid in ids:
        d.add_vertex(VertexInfo(vid))
    for i, (u, v) in enumerate(edges):
        e = d.add_edge(u, v)
        e.weight = (weights or {}).get((u, v), 1)
    return d


def test_sort_reduction_breaks_cycle():
    d = make_digraph([(0, 1), (1, 2), (2, 0)], weights={(2, 0): 0.5, (0, 1): 5, (1, 2): 5})
    sort_reduction_by_weight(d)
    assert len(d.sort_topologically()) == 3  # now a DAG
    assert d.size == 2


def test_cluster_weights_linear_chain():
    d = make_digraph([(0, 1), (1, 2), (2, 3)])
    cw = find_cluster_weights(d)
    # each vertex contributes its longest forward chain piece
    e01 = d.get_edge(0, 1)
    assert cw[e01] >= 1
    cwh = find_cluster_weights_heuristic(d)
    assert set(cwh) == set(cw)


def test_conservation_path_linear():
    d = make_digraph([(0, 1), (1, 2), (2, 3)])
    cw = find_cluster_weights(d)
    path = find_conservation_path(d, cw)
    assert path == [0, 1, 2, 3]


def test_extract_paths_takes_whole_chain():
    d = make_digraph([(i, i + 1) for i in range(12)])
    paths = extract_paths(d)
    assert paths[0] == list(range(13))


def test_linearize_drops_short_paths():
    d = make_digraph([(0, 1)])
    # single 2-vertex path survives (> 1), shorter-than-10 but untouched rule
    paths = linearize_graph(d)
    assert paths == [[0, 1]]


def test_linearize_branching_peels_best_first():
    # main chain 0..9 plus a branch 20->4 (weaker)
    edges = [(i, i + 1) for i in range(9)] + [(20, 4)]
    d = make_digraph(edges)
    paths = linearize_graph(d)
    assert list(range(10)) in paths


def test_linearize_joins_paths_through_shadow_edge():
    # two long chains A: 0..9, B: 10..19, with a shadow edge from near
    # A's end (8) to near B's start (11): distance (1 + 1) <= 3 -> join
    edges = [(i, i + 1) for i in range(9)] + [(i, i + 1) for i in range(10, 19)]
    d = make_digraph(edges)
    se = d.add_edge(8, 11)
    se.shadow = True
    paths = linearize_graph(d)
    joined = [p for p in paths if 0 in p and 19 in p]
    assert joined, f"no joined path in {paths}"
    p = joined[0]
    # join splices A up to vertex 8 with B from vertex 11
    assert p[:9] == list(range(9))
    assert p[9:] == list(range(11, 20))


def test_linearize_join_distance_gate():
    # shadow edge from A's middle to B's middle: end-distance > 3 -> no join
    edges = [(i, i + 1) for i in range(9)] + [(i, i + 1) for i in range(10, 19)]
    d = make_digraph(edges)
    se = d.add_edge(4, 15)
    se.shadow = True
    paths = linearize_graph(d)
    assert not any(0 in p and 19 in p for p in paths)
    assert list(range(10)) in paths
    assert list(range(10, 20)) in paths
