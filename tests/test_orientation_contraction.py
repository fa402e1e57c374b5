"""Direct unit tests for orientation propagation and contraction."""

from muchsalsa_tpu.assemble.contraction import (
    find_contraction_edges,
    find_contraction_targets,
    find_deletable_vertices,
    prune_contained_orders,
)
from muchsalsa_tpu.assemble.orientation import get_directed_graph, pick_start_vertex
from muchsalsa_tpu.graph.graph import Direction, EdgeOrder, Graph, VertexInfo


def make_graph(vertices, edges):
    g = Graph()
    for vid, length in vertices:
        g.add_vertex(VertexInfo(vid, nanopore_length=length, meta_line=vid))
    out = {}
    for u, v in edges:
        out[(u, v)] = g.add_edge(u, v)
    return g, out


def order(start, end, direction=True, contained=False, primary=True,
          base=None, score=100, lo=0.0, ro=0.0, ids=(0,)):
    return EdgeOrder(start, end, lo, ro, contained, base if base is not None else start,
                     score, tuple(ids), direction, primary)


def test_orientation_propagates_signs():
    # chain 0 -(+)- 1 -(-)- 2 : vertex 2 gets NEG orientation
    g, e = make_graph([(0, 5000), (1, 4000), (2, 3000)], [(0, 1), (1, 2)])
    e[(0, 1)].orders.append(order(0, 1, direction=True))
    e[(1, 2)].orders.append(order(1, 2, direction=False))
    e[(0, 1)].consensus_direction = Direction.POS
    e[(1, 2)].consensus_direction = Direction.NEG
    e[(0, 1)].weight = 10
    e[(1, 2)].weight = 10

    start = pick_start_vertex(g)
    assert start == 0  # longest read
    dig = get_directed_graph(g, g, start)
    assert g.vertex(0).direction == Direction.POS
    assert g.vertex(1).direction == Direction.POS
    assert g.vertex(2).direction == Direction.NEG
    # orders copied onto directed edges
    assert dig.size == 2
    assert all(len(ed.orders) == 1 for ed in dig.edges())


def test_orientation_flip_rule():
    # order with direction=False and base == neighbor flips start/end
    g, e = make_graph([(0, 5000), (1, 4000)], [(0, 1)])
    # base = 0 (edge's first vertex); traversal from 0 sees neighbor 1
    e[(0, 1)].orders.append(order(0, 1, direction=False, base=0))
    e[(0, 1)].consensus_direction = Direction.NEG
    dig = get_directed_graph(g, g, 0)
    # no flip (base != neighbor): directed edge keeps (0, 1)
    assert dig.has_edge(0, 1)

    g2, e2 = make_graph([(0, 5000), (1, 4000)], [(0, 1)])
    o = order(0, 1, direction=False, base=1)
    e2[(0, 1)].orders.append(o)
    e2[(0, 1)].consensus_direction = Direction.NEG
    dig2 = get_directed_graph(g2, g2, 0)
    # flip (direction False and base == neighbor 1): edge reversed
    assert dig2.has_edge(1, 0)


def test_contraction_pipeline():
    # 1 contained in 0; both connect to 2 with agreeing orders
    g, e = make_graph([(0, 9000), (1, 2000), (2, 8000)], [(0, 1), (0, 2), (1, 2)])
    # contained+primary order: start=1 (contained), end=0
    c_order = order(1, 0, direction=True, contained=True, primary=True, base=0, ids=(7,))
    e[(0, 1)].orders.append(c_order)
    # neighbor edges with agreeing orders (non-contained, direction True)
    e[(0, 2)].orders.append(order(0, 2, direction=True, base=0))
    e[(1, 2)].orders.append(order(1, 2, direction=True, base=1))

    ce = find_contraction_edges(g, wiggle_room=300)
    assert e[(0, 1)] in ce
    targets = find_contraction_targets(g, ce)
    assert targets[1] == 0
    deletable, roots = find_deletable_vertices(ce, targets)
    assert deletable == {1}
    assert roots == {0}

    # prune: contained orders dropped; edge (0,1) becomes orderless
    removable = prune_contained_orders(g)
    assert e[(0, 1)] in removable
    assert e[(0, 1)].orders == []
    assert e[(0, 2)].orders  # non-contained kept


def test_contraction_requires_neighbor_edge():
    # neighbor of the contained vertex has no edge to the container -> not sane
    g, e = make_graph([(0, 9000), (1, 2000), (3, 7000)], [(0, 1), (1, 3)])
    e[(0, 1)].orders.append(order(1, 0, contained=True, primary=True, base=0))
    e[(1, 3)].orders.append(order(1, 3))
    ce = find_contraction_edges(g, wiggle_room=300)
    assert e[(0, 1)] not in ce
