"""Myers bit-parallel prototypes vs the full-DP oracle."""

import numpy as np
import pytest

from muchsalsa_tpu.ops.align import edit_distance_np
from muchsalsa_tpu.ops.myers import myers_bigint, myers_words_np
from muchsalsa_tpu.testing.simulate import random_genome
from tests.test_align import mutate


def cases(seed, n_cases=20, max_len=300):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_cases):
        m = int(rng.integers(1, max_len))
        q = random_genome(rng, m)
        t = mutate(rng, q, rate=float(rng.uniform(0, 0.3)))
        if len(t) == 0:
            t = b"A"
        out.append((q, t))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bigint_matches_oracle(seed):
    for q, t in cases(seed):
        assert myers_bigint(q, t) == edit_distance_np(q, t), (q, t)


def test_bigint_edge_cases():
    assert myers_bigint(b"", b"ACGT") == 4
    assert myers_bigint(b"ACGT", b"") == 4
    assert myers_bigint(b"A", b"A") == 0
    assert myers_bigint(b"A", b"T") == 1
    assert myers_bigint(b"ACGT" * 30, b"ACGT" * 30) == 0  # crosses word sizes


@pytest.mark.parametrize("seed", [3, 4])
def test_words_matches_oracle(seed):
    for q, t in cases(seed, max_len=200):
        expected = edit_distance_np(q, t)
        assert myers_words_np(q, t) == expected, (len(q), len(t))


def test_words_multiword_patterns():
    rng = np.random.default_rng(9)
    for m in (31, 32, 33, 63, 64, 65, 100, 257):
        q = random_genome(rng, m)
        t = mutate(rng, q, 0.15)
        assert myers_words_np(q, t) == edit_distance_np(q, t), m


def test_jax_matches_oracle():
    from muchsalsa_tpu.ops.align import pack_problems
    from muchsalsa_tpu.ops.myers_jax import myers_edit_distance

    pairs = cases(7, n_cases=16, max_len=250)
    expected = np.array([edit_distance_np(q, t) for q, t in pairs])
    q_codes, q_lens, t_codes, t_lens = pack_problems(pairs)
    out = np.asarray(myers_edit_distance(q_codes, q_lens, t_codes, t_lens))
    np.testing.assert_array_equal(out, expected)


def test_jax_edge_cases():
    from muchsalsa_tpu.ops.align import pack_problems
    from muchsalsa_tpu.ops.myers_jax import myers_edit_distance

    pairs = [
        (b"A", b"A"),
        (b"A", b"T"),
        (b"ACGT" * 40, b"ACGT" * 40),   # multiword, exact
        (b"AAAA", b"TTTTTTTT"),          # big length diff
        (b"A" * 31, b"A" * 33),          # word-boundary lengths
        (b"A" * 32, b"A" * 32),
        (b"A" * 33, b"A" * 31),
    ]
    expected = np.array([edit_distance_np(q, t) for q, t in pairs])
    out = np.asarray(myers_edit_distance(*pack_problems(pairs)))
    np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize("seed", [5, 6])
def test_banded_words_matches_oracle(seed):
    from muchsalsa_tpu.ops.myers import myers_banded_np

    rng = np.random.default_rng(seed)
    for _ in range(15):
        msize = int(rng.integers(30, 600))
        q = random_genome(rng, msize)
        t = mutate(rng, q, rate=float(rng.uniform(0, 0.15)))
        if not t:
            t = b"A"
        expected = edit_distance_np(q, t)
        got = myers_banded_np(q, t, window_words=8)
        assert got == expected, (len(q), len(t), got, expected)


def test_banded_words_window_edges():
    from muchsalsa_tpu.ops.myers import myers_banded_np

    rng = np.random.default_rng(11)
    for m in (31, 32, 33, 255, 256, 257, 300):
        q = random_genome(rng, m)
        t = mutate(rng, q, 0.1)
        assert myers_banded_np(q, t, 8) == edit_distance_np(q, t), m


def test_banded_words_band_guard():
    from muchsalsa_tpu.ops.myers import myers_banded_np

    assert myers_banded_np(b"A" * 500, b"A" * 10, 8) == -1


def test_jax_banded_matches_oracle():
    from muchsalsa_tpu.ops.align import pack_problems
    from muchsalsa_tpu.ops.myers_jax import myers_banded

    rng = np.random.default_rng(13)
    pairs = []
    for _ in range(16):
        msize = int(rng.integers(30, 500))
        q = random_genome(rng, msize)
        t = mutate(rng, q, rate=float(rng.uniform(0, 0.15)))
        pairs.append((q, t if t else b"A"))
    expected = np.array([edit_distance_np(q, t) for q, t in pairs])
    out = np.asarray(myers_banded(*pack_problems(pairs), window_words=8))
    np.testing.assert_array_equal(out, expected)


def test_jax_banded_band_guard():
    from muchsalsa_tpu.ops.align import pack_problems
    from muchsalsa_tpu.ops.myers_jax import myers_banded

    # shared-band geometry: a batch whose diffs span more than the band
    pairs = [(b"A" * 500, b"A" * 10), (b"ACGT" * 50, b"ACGT" * 50)]
    out = np.asarray(myers_banded(*pack_problems(pairs), window_words=8))
    assert out[0] == -1
