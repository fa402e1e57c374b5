import numpy as np

from muchsalsa_tpu.io.paf import PafRecords
from muchsalsa_tpu.io.registry import Registry
from muchsalsa_tpu.matching.edges import _pair_indices, build_edges
from muchsalsa_tpu.matching.store import MatchStore


def make_records(rows):
    """rows: list of dicts with keys nano, illu, ns, ne, is_, ie, dir, score, primary, line."""
    reg_n, reg_i = Registry(), Registry()
    return PafRecords(
        illu_id=np.array([r["illu"] for r in rows], dtype=np.int32),
        nano_id=np.array([r["nano"] for r in rows], dtype=np.int32),
        illu_start=np.array([r["is_"] for r in rows], dtype=np.int32),
        illu_end=np.array([r["ie"] for r in rows], dtype=np.int32),
        nano_start=np.array([r["ns"] for r in rows], dtype=np.int32),
        nano_end=np.array([r["ne"] for r in rows], dtype=np.int32),
        nano_length=np.array([r.get("nlen", 10000) for r in rows], dtype=np.int32),
        direction=np.array([r.get("dir", True) for r in rows], dtype=bool),
        score=np.array([r.get("score", 500) for r in rows], dtype=np.int64),
        is_primary=np.array([r.get("primary", True) for r in rows], dtype=bool),
        line_idx=np.array([r["line"] for r in rows], dtype=np.int64),
        registry_nanopore=reg_n,
        registry_illumina=reg_i,
    )


def test_store_dedup_keeps_lowest_line():
    rec = make_records([
        dict(nano=1, illu=7, ns=0, ne=99, is_=0, ie=99, line=5, score=501),
        dict(nano=1, illu=7, ns=10, ne=109, is_=10, ie=109, line=2, score=502),
        dict(nano=1, illu=8, ns=0, ne=99, is_=0, ie=99, line=9, score=503),
    ])
    store = MatchStore.from_paf(rec)
    assert len(store) == 2
    row = store.row(1, 7)
    assert store.line[row] == 2 and store.score[row] == 502
    assert store.row(1, 8) >= 0
    assert store.row(1, 9) == -1
    assert store.row(2, 7) == -1


def test_store_vertex_meta_is_min_line():
    rec = make_records([
        dict(nano=3, illu=1, ns=0, ne=99, is_=0, ie=99, line=4),
        dict(nano=3, illu=2, ns=0, ne=99, is_=0, ie=99, line=1),
        dict(nano=5, illu=1, ns=0, ne=99, is_=0, ie=99, line=0),
    ])
    store = MatchStore.from_paf(rec)
    vi3 = store.vertex_index(3)
    vi5 = store.vertex_index(5)
    assert store.vertex_meta_line[vi3] == 1
    assert store.vertex_meta_line[vi5] == 0


def test_pair_indices():
    inner, outer = _pair_indices(np.array([3, 1, 2]))
    # group0 (rows 0,1,2): pairs (0,1),(0,2),(1,2); group1: none; group2 (rows 4,5): (4,5)
    pairs = sorted(zip(inner.tolist(), outer.tolist()))
    assert pairs == [(0, 1), (0, 2), (1, 2), (4, 5)]
    assert np.all(inner < outer)


def test_pair_indices_large_group():
    inner, outer = _pair_indices(np.array([50]))
    assert len(inner) == 50 * 49 // 2
    expected = {(i, j) for j in range(50) for i in range(j)}
    assert set(zip(inner.tolist(), outer.tolist())) == expected


def test_build_edges_basic():
    # three reads sharing unitig 0; read 10/11 overlap enough, 12 barely not
    rec = make_records([
        dict(nano=10, illu=0, ns=0, ne=999, is_=0, ie=500, line=0, score=600),
        dict(nano=11, illu=0, ns=0, ne=999, is_=300, ie=900, line=1, score=700),
        dict(nano=12, illu=0, ns=0, ne=999, is_=801, ie=999, line=2, score=800),
    ])
    store = MatchStore.from_paf(rec)
    em = build_edges(store, th_overlap=100)
    # (10,11): overlap [300,500] len 201 > 101 -> edge
    # (10,12): no intersection
    # (11,12): overlap [801,900] len 100 -> end-start=99 <= 100 -> no edge
    assert em.n_edges == 1
    assert (em.edge_v[0], em.edge_w[0]) == (10, 11)
    assert em.em_illu[0] == 0
    assert (em.em_ov_start[0], em.em_ov_end[0]) == (300, 500)
    # score = 700*201/601 + 600*201/501
    np.testing.assert_allclose(em.em_score[0], 700 * 201 / 601 + 600 * 201 / 501)
    assert em.em_line[0] == 1  # outer (later) line


def test_build_edges_vertex_order_by_meta_line():
    # nano 20 first appears on line 5, nano 21 on line 1 -> edge (21, 20)
    rec = make_records([
        dict(nano=20, illu=0, ns=0, ne=999, is_=0, ie=600, line=5),
        dict(nano=21, illu=0, ns=0, ne=999, is_=100, ie=700, line=1),
    ])
    store = MatchStore.from_paf(rec)
    em = build_edges(store)
    assert em.n_edges == 1
    assert (em.edge_v[0], em.edge_w[0]) == (21, 20)


def test_build_edges_multi_unitig_same_pair():
    # same read pair overlapping on two unitigs -> one edge, two edge matches
    rec = make_records([
        dict(nano=1, illu=0, ns=0, ne=999, is_=0, ie=600, line=0),
        dict(nano=2, illu=0, ns=0, ne=999, is_=100, ie=700, line=1),
        dict(nano=1, illu=1, ns=0, ne=999, is_=0, ie=600, line=2),
        dict(nano=2, illu=1, ns=0, ne=999, is_=100, ie=700, line=3),
    ])
    store = MatchStore.from_paf(rec)
    em = build_edges(store)
    assert em.n_edges == 1
    assert len(em.em_edge) == 2
    assert set(em.em_illu.tolist()) == {0, 1}
    rows = em.edge_rows(0)
    assert len(rows) == 2


def test_build_edges_direction_and_primary():
    rec = make_records([
        dict(nano=1, illu=0, ns=0, ne=999, is_=0, ie=600, line=0, dir=True, primary=True),
        dict(nano=2, illu=0, ns=0, ne=999, is_=100, ie=700, line=1, dir=False, primary=False),
    ])
    store = MatchStore.from_paf(rec)
    em = build_edges(store)
    assert not em.em_direction[0]
    assert not em.em_primary[0]
