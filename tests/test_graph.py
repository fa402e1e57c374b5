import pytest

from muchsalsa_tpu.graph import DiGraph, Direction, Graph, VertexInfo, shortest_path


def build_graph(edges, n=None):
    g = Graph()
    ids = sorted({v for e in edges for v in e})
    for vid in ids:
        g.add_vertex(VertexInfo(vid))
    for u, v in edges:
        g.add_edge(u, v)
    return g


def test_graph_add_delete():
    g = build_graph([(0, 1), (1, 2), (2, 0)])
    assert g.order == 3 and g.size == 3
    assert g.has_edge(0, 1) and g.has_edge(1, 0)
    e = g.get_edge(0, 1)
    assert g.get_edge(1, 0) is e
    g.delete_edge(e)
    assert g.size == 2 and not g.has_edge(0, 1)
    g.delete_vertex(2)
    assert g.order == 2 and g.size == 0


def test_graph_add_edge_idempotent():
    g = build_graph([(0, 1)])
    e1 = g.get_edge(0, 1)
    e2 = g.add_edge(0, 1)
    assert e1 is e2
    e3 = g.add_edge(1, 0)  # reversed insertion returns the same edge
    assert e3 is e1
    assert g.size == 1


def test_subgraph_shares_objects():
    g = build_graph([(0, 1), (1, 2), (2, 3)])
    sub = g.subgraph([1, 2])
    assert sub.order == 2 and sub.size == 1
    assert sub.get_edge(1, 2) is g.get_edge(1, 2)
    # direction set through the subgraph is visible in the parent
    sub.vertex(1).direction = Direction.NEG
    assert g.vertex(1).direction == Direction.NEG


def test_digraph_degrees_and_topo():
    d = DiGraph()
    for vid in range(4):
        d.add_vertex(VertexInfo(vid))
    d.add_edge(0, 1)
    d.add_edge(0, 2)
    d.add_edge(1, 3)
    d.add_edge(2, 3)
    assert d.in_degree(3) == 2 and d.out_degree(0) == 2
    topo = d.sort_topologically()
    assert topo.index(0) < topo.index(1) < topo.index(3)
    assert topo.index(0) < topo.index(2) < topo.index(3)
    d.delete_vertex(3)
    assert d.size == 2
    assert d.out_degree(1) == 0


def test_digraph_topo_cycle_partial():
    # reference sortTopologically silently drops cycle members
    d = DiGraph()
    for vid in range(3):
        d.add_vertex(VertexInfo(vid))
    d.add_edge(0, 1)
    d.add_edge(1, 2)
    d.add_edge(2, 1)
    assert d.sort_topologically() == [0]


def test_digraph_copy_independent_structure():
    d = DiGraph()
    for vid in range(3):
        d.add_vertex(VertexInfo(vid))
    d.add_edge(0, 1)
    d.add_edge(1, 2)
    c = d.copy()
    c.delete_edge(c.get_edge(0, 1))
    assert d.has_edge(0, 1)  # original untouched
    assert not c.has_edge(0, 1)
    # but Edge objects are shared (shadow flags propagate, lg.cpp:505)
    c.get_edge(1, 2).shadow = True
    assert d.get_edge(1, 2).shadow


def test_shortest_path():
    g = build_graph([(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5)])
    p = shortest_path(g, 0, 5)
    assert p[0] == 0 and p[-1] == 5 and len(p) == 4
    assert shortest_path(g, 2, 2) == [2]
    g2 = build_graph([(0, 1), (2, 3)])
    assert shortest_path(g2, 0, 3) == []


def test_tree_paths_match_bfs_shortest_path():
    import numpy as np

    from muchsalsa_tpu.assemble.spanning import _TreePaths, max_span_tree
    from muchsalsa_tpu.graph.graph import Direction, Graph, VertexInfo, shortest_path

    rng = np.random.default_rng(33)
    g = Graph()
    n = 60
    for i in range(n):
        g.add_vertex(VertexInfo(i, 100, i))
    # random connected-ish graph with direction-consistent edges
    for _ in range(150):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a == b or g.has_edge(a, b):
            continue
        e = g.add_edge(a, b)
        e.weight = int(rng.integers(1, 100))
        e.consensus_direction = Direction.POS
    tree = max_span_tree(g)
    tp = _TreePaths(tree)
    for _ in range(200):
        u, v = int(rng.integers(0, n)), int(rng.integers(0, n))
        assert tp.path(u, v) == shortest_path(tree, u, v), (u, v)
