"""Pallas banded-DP kernel vs the XLA version (interpret mode on CPU)."""

import numpy as np
import pytest

from muchsalsa_tpu.ops.align import banded_edit_distance, edit_distance_np, pack_problems
from muchsalsa_tpu.ops.align_pallas import banded_edit_distance_pallas
from muchsalsa_tpu.testing.simulate import random_genome
from tests.test_align import mutate


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(6):
        n = int(rng.integers(40, 200))
        q = random_genome(rng, n)
        t = mutate(rng, q, rate=0.12)
        pairs.append((q, t))
    args = pack_problems(pairs)
    ref = np.asarray(banded_edit_distance(*args, band=128))
    out = np.asarray(banded_edit_distance_pallas(*args, band=128, interpret=True))
    np.testing.assert_array_equal(out, ref)
    expected = np.array([edit_distance_np(q, t) for q, t in pairs])
    np.testing.assert_array_equal(out, expected)


def test_pallas_band_guard():
    args = pack_problems([(b"A" * 300, b"A" * 10)])
    out = banded_edit_distance_pallas(*args, band=128, interpret=True)
    assert int(out[0]) == -1
