"""Pallas banded Myers kernel vs the oracle and the XLA banded kernel.

Runs in Pallas interpret mode on the CPU backend; the compiled TPU path
is exercised by bench.py.
"""

import numpy as np
import pytest

from muchsalsa_tpu.ops.align import edit_distance_np, pack_problems
from muchsalsa_tpu.ops.myers_pallas import _geometry, myers_banded_pallas
from muchsalsa_tpu.testing.simulate import random_genome
from tests.test_align import mutate

W_BITS = 32


def run(pairs, window_words=4):
    q_codes, q_lens, t_codes, t_lens = pack_problems(pairs)
    out = myers_banded_pallas(
        q_codes, q_lens, t_codes, t_lens,
        window_words=window_words, interpret=True,
    )
    return np.asarray(out)


def banded_cases(seed, n_cases=24, max_len=400, rate=0.12):
    """Pairs whose edit path stays well inside a 4-word (128-diagonal)
    static band."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_cases):
        m = int(rng.integers(40, max_len))
        q = random_genome(rng, m)
        t = mutate(rng, q, rate=float(rng.uniform(0, rate)))
        if len(t) == 0:
            t = b"A"
        out.append((q, t))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_oracle_in_band(seed):
    pairs = banded_cases(seed)
    got = run(pairs)
    for i, (q, t) in enumerate(pairs):
        expected = edit_distance_np(q, t)
        if got[i] == -1:
            # length difference outside the static band — allowed refusal
            klo, khi, _ = _geometry(4)
            diff = len(t) - len(q)
            assert not (klo + W_BITS <= diff <= khi - W_BITS) or expected > 0
            continue
        assert got[i] == expected, (i, len(q), len(t))


def test_window_sizes_and_word_edges():
    rng = np.random.default_rng(5)
    for ww in (2, 4, 8):
        for m in (31, 32, 33, 64, 100, 257, 300):
            q = random_genome(rng, m)
            t = mutate(rng, q, 0.08)
            got = run([(q, t)], window_words=ww)[0]
            expected = edit_distance_np(q, t)
            if got != -1:
                assert got == expected, (ww, m)


def test_band_guard_refuses_large_diff():
    rng = np.random.default_rng(6)
    q = random_genome(rng, 100)
    t = random_genome(rng, 600)  # diff = 500 >> 2-word band
    assert run([(q, t)], window_words=2)[0] == -1


def test_matches_xla_banded_on_mixed_batch():
    """Every problem the Pallas kernel accepts agrees with the oracle;
    acceptance set may differ from the XLA kernel (static vs shared
    dynamic geometry)."""
    pairs = banded_cases(7, n_cases=40, max_len=600)
    got = run(pairs, window_words=8)
    refused = 0
    for i, (q, t) in enumerate(pairs):
        if got[i] == -1:
            refused += 1
            continue
        assert got[i] == edit_distance_np(q, t), i
    assert refused < len(pairs) // 2


def test_empty_and_degenerate():
    out = run([(b"A", b"A"), (b"ACGT" * 20, b"ACGT" * 20)])
    assert out[0] == 0
    assert out[1] == 0


def test_full_pallas_matches_oracle():
    from muchsalsa_tpu.ops.myers_pallas import myers_banded_pallas  # noqa: F401
    from muchsalsa_tpu.ops.myers_full_pallas import myers_edit_distance_pallas

    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(20):
        m = int(rng.integers(1, 300))
        q = random_genome(rng, m)
        t = mutate(rng, q, rate=float(rng.uniform(0, 0.5)))
        if len(t) == 0:
            t = b"A"
        pairs.append((q, t))
    # wildly different lengths (no band to respect)
    pairs.append((random_genome(rng, 10), random_genome(rng, 500)))
    pairs.append((random_genome(rng, 500), random_genome(rng, 10)))

    q_codes, q_lens, t_codes, t_lens = pack_problems(pairs)
    got = np.asarray(myers_edit_distance_pallas(
        q_codes, q_lens, t_codes, t_lens, interpret=True))
    for i, (q, t) in enumerate(pairs):
        assert got[i] == edit_distance_np(q, t), (i, len(q), len(t))


def test_full_pallas_word_edges():
    from muchsalsa_tpu.ops.myers_full_pallas import myers_edit_distance_pallas

    rng = np.random.default_rng(12)
    pairs = []
    for m in (31, 32, 33, 63, 64, 65, 96, 97):
        q = random_genome(rng, m)
        pairs.append((q, mutate(rng, q, 0.2)))
    q_codes, q_lens, t_codes, t_lens = pack_problems(pairs)
    got = np.asarray(myers_edit_distance_pallas(
        q_codes, q_lens, t_codes, t_lens, interpret=True))
    for i, (q, t) in enumerate(pairs):
        assert got[i] == edit_distance_np(q, t), (i, len(q))
