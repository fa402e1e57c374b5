"""Device/sharded scaffold all-pairs edge calc vs the host path."""

import numpy as np
import pytest

from muchsalsa_tpu.io.registry import Registry
from muchsalsa_tpu.io.paf import read_paf
from muchsalsa_tpu.matching.edges import build_edges
from muchsalsa_tpu.matching.edges_jax import build_edges_device
from muchsalsa_tpu.matching.store import MatchStore
from muchsalsa_tpu.testing.simulate import simulate, write_simulation


def _store(tmp_path, seed=3, glen=40_000):
    rng = np.random.default_rng(seed)
    sim = simulate(rng, genome_length=glen, coverage=9.0, both_strands=True)
    paths = write_simulation(sim, tmp_path / "data")
    records = read_paf(paths["paf"], registry_nanopore=Registry(),
                       registry_illumina=Registry())
    return MatchStore.from_paf(records)


def _assert_equal(a, b):
    for field in ("edge_v", "edge_w", "em_edge", "em_illu", "em_ov_start",
                  "em_ov_end", "em_direction", "em_score", "em_primary",
                  "em_line"):
        np.testing.assert_array_equal(
            getattr(a, field), getattr(b, field), err_msg=field)


def test_device_edges_match_host(tmp_path):
    store = _store(tmp_path)
    _assert_equal(build_edges_device(store), build_edges(store))


def test_device_edges_mixed_host_fallback(tmp_path):
    """Scaffolds above the bucket cap run through the host pair path;
    the merged result is still identical."""
    store = _store(tmp_path)
    _assert_equal(build_edges_device(store, max_scaffold=4), build_edges(store))


def test_device_edges_sharded(tmp_path):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from muchsalsa_tpu.parallel.mesh import make_mesh

    store = _store(tmp_path, seed=5)
    mesh = make_mesh(len(jax.devices()))
    _assert_equal(build_edges_device(store, mesh=mesh), build_edges(store))


def test_device_edges_empty():
    from muchsalsa_tpu.io.paf import PafRecords
    from muchsalsa_tpu.io.registry import Registry

    z32 = np.zeros(0, dtype=np.int32)
    empty = MatchStore.from_paf(PafRecords(
        illu_id=z32, nano_id=z32, illu_start=z32, illu_end=z32,
        nano_start=z32, nano_end=z32, nano_length=z32,
        direction=np.zeros(0, dtype=bool), score=np.zeros(0, dtype=np.int64),
        is_primary=np.zeros(0, dtype=bool),
        line_idx=np.zeros(0, dtype=np.int64),
        registry_nanopore=Registry(), registry_illumina=Registry()))
    _assert_equal(build_edges_device(empty), build_edges(empty))
