"""Unit tests for the chaining oracle + overlap classification
(reference kernels mpp.cpp / ol.cpp — untested upstream, SURVEY.md §4)."""

import numpy as np

from muchsalsa_tpu.io.paf import PafRecords
from muchsalsa_tpu.io.registry import Registry
from muchsalsa_tpu.matching.edges import build_edges
from muchsalsa_tpu.matching.store import MatchStore
from muchsalsa_tpu.ops.chaining import make_edge_context, max_pairwise_paths
from muchsalsa_tpu.ops.overlap import get_overlap
from tests.test_matching import make_records


def two_read_scenario(n_units=4, unit_len=1000, gap=200, shift=2000):
    """Two reads overlapping over several colinear unitigs.

    Read A covers genome [0, 8000); read B covers [shift, shift+8000).
    Unitigs tile the genome; both reads match each unitig they span.
    """
    rows = []
    line = 0
    for u in range(n_units):
        gs = u * (unit_len + gap) + 500
        ge = gs + unit_len - 1
        for nano, rs in ((1, 0), (2, shift)):
            re_ = rs + 8000
            if gs >= rs and ge < re_:
                rows.append(
                    dict(
                        nano=nano, illu=u,
                        ns=gs - rs, ne=ge - rs,
                        is_=0, ie=unit_len - 1,
                        line=line, score=900, primary=True, dir=True,
                        nlen=8000,
                    )
                )
                line += 1
    return make_records(rows)


def test_chain_colinear_anchors():
    rec = two_read_scenario()
    store = MatchStore.from_paf(rec)
    em = build_edges(store)
    assert em.n_edges == 1
    ctx = make_edge_context(store, em, 0)
    k = len(ctx.illu_ids)
    assert k >= 2
    plus_rows = np.arange(k)
    paths = max_pairwise_paths(ctx, plus_rows, True, 300)
    # all shared anchors are colinear -> one chain containing all of them
    assert len(paths) == 1
    assert len(paths[0].ids) == k
    assert paths[0].primary
    # chain ordered by position on read 1 (the edge's first vertex)
    order = [int(x) for x in np.argsort(ctx.v_ns)]
    assert paths[0].ids == [int(ctx.illu_ids[i]) for i in order]


def test_chain_score_is_sum_truncated():
    rec = two_read_scenario()
    store = MatchStore.from_paf(rec)
    em = build_edges(store)
    ctx = make_edge_context(store, em, 0)
    paths = max_pairwise_paths(ctx, np.arange(len(ctx.illu_ids)), True, 300)
    expected = int(sum(float(s) for s in ctx.em_score))
    assert paths[0].score == expected


def test_chain_incompatible_far_anchor():
    # two anchors whose gap sizes disagree wildly between the two reads
    rows = [
        # read 1: anchors at [0,999] and [5000,5999]  (gap 4000)
        dict(nano=1, illu=0, ns=0, ne=999, is_=0, ie=999, line=0, score=900, nlen=20000),
        dict(nano=1, illu=1, ns=5000, ne=5999, is_=0, ie=999, line=1, score=900, nlen=20000),
        # read 2: anchors at [0,999] and [1500,2499] (gap 500) -> inconsistent
        dict(nano=2, illu=0, ns=0, ne=999, is_=0, ie=999, line=2, score=900, nlen=20000),
        dict(nano=2, illu=1, ns=1500, ne=2499, is_=0, ie=999, line=3, score=900, nlen=20000),
    ]
    store = MatchStore.from_paf(make_records(rows))
    em = build_edges(store)
    assert em.n_edges == 1
    ctx = make_edge_context(store, em, 0)
    paths = max_pairwise_paths(ctx, np.arange(2), True, 300)
    # incompatible -> best chain is a single anchor; the other anchor
    # forms a disjoint secondary chain with equal score (> 75% threshold)
    assert len(paths[0].ids) == 1
    assert len(paths) == 2
    assert set(paths[0].ids + paths[1].ids) == {0, 1}


def test_get_overlap_dovetail():
    rec = two_read_scenario(shift=2000)
    store = MatchStore.from_paf(rec)
    em = build_edges(store)
    ctx = make_edge_context(store, em, 0)
    paths = max_pairwise_paths(ctx, np.arange(len(ctx.illu_ids)), True, 300)
    order = get_overlap(ctx, paths[0].ids, True, paths[0].score, paths[0].primary)
    assert order is not None
    # read B starts 2000 later -> read A extends left, B extends right:
    # dovetail (not contained), start = A
    assert not order.contained
    assert order.start == ctx.v if ctx.v_ns[0] is not None else True
    v_meta_first = em.edge_v[0]
    assert order.start == v_meta_first  # A has earlier meta line
    assert order.direction
    assert order.primary


def test_get_overlap_containment():
    # read 2 contained in read 1's span
    rows = [
        dict(nano=1, illu=0, ns=4000, ne=4999, is_=0, ie=999, line=0, score=900, nlen=20000),
        dict(nano=2, illu=0, ns=500, ne=1499, is_=0, ie=999, line=1, score=900, nlen=3000),
    ]
    store = MatchStore.from_paf(make_records(rows))
    em = build_edges(store)
    ctx = make_edge_context(store, em, 0)
    paths = max_pairwise_paths(ctx, np.arange(1), True, 300)
    order = get_overlap(ctx, paths[0].ids, True, paths[0].score, paths[0].primary)
    assert order is not None
    # read 2 (3kb, anchor central) is contained within read 1 (20kb)
    assert order.contained
    assert order.start == 2  # contained read is the start vertex
    assert order.end == 1
