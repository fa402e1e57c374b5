"""Device minimizer sketch vs the numpy host path."""

import numpy as np
import jax.numpy as jnp

from muchsalsa_tpu.ops.minimizer import minimizers
from muchsalsa_tpu.ops.minimizer_jax import anchor_counts, minimizer_sketch
from muchsalsa_tpu.testing.simulate import random_genome
from muchsalsa_tpu.utils.seq import encode_2bit


def pad_batch(seqs, L=None):
    L = L or max(len(s) for s in seqs)
    R = len(seqs)
    codes = np.full((R, L), 4, dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = encode_2bit(s)
        lens[i] = len(s)
    return jnp.asarray(codes), jnp.asarray(lens)


def test_sketch_matches_host():
    rng = np.random.default_rng(0)
    seqs = [random_genome(rng, int(rng.integers(60, 400))) for _ in range(10)]
    codes, lens = pad_batch(seqs)
    selected, h, strand = minimizer_sketch(codes, lens, 15, 5)
    selected = np.asarray(selected)
    h = np.asarray(h)
    strand = np.asarray(strand)

    for i, s in enumerate(seqs):
        pos, hh, st = minimizers(s, 15, 5)
        dev_pos = np.nonzero(selected[i])[0]
        np.testing.assert_array_equal(dev_pos, pos, err_msg=f"read {i} positions")
        np.testing.assert_array_equal(h[i][dev_pos], hh)
        np.testing.assert_array_equal(strand[i][dev_pos], st)


def test_sketch_respects_length_mask():
    rng = np.random.default_rng(1)
    s = random_genome(rng, 100)
    codes, lens = pad_batch([s], L=300)  # heavy padding
    selected, _, _ = minimizer_sketch(codes, lens, 15, 5)
    sel = np.nonzero(np.asarray(selected)[0])[0]
    pos, _, _ = minimizers(s, 15, 5)
    np.testing.assert_array_equal(sel, pos)


def test_anchor_counts_against_index():
    rng = np.random.default_rng(2)
    genome = random_genome(rng, 5000)
    unitig = genome[1000:2200]
    # index = sorted minimizer hashes of the unitig
    _, hh, _ = minimizers(unitig, 15, 5)
    index = jnp.asarray(np.sort(hh))

    inside = genome[800:2400]    # covers the unitig
    outside = random_genome(np.random.default_rng(9), 1600)
    codes, lens = pad_batch([inside, outside])
    counts = np.asarray(anchor_counts(codes, lens, index, 15, 5))
    assert counts[0] > 20
    assert counts[1] <= 2  # chance collisions only


def test_anchor_counts_bitmap_upper_bounds_exact():
    from muchsalsa_tpu.ops.minimizer_jax import (
        anchor_counts_bitmap,
        build_hash_bitmap,
    )

    rng = np.random.default_rng(4)
    genome = random_genome(rng, 8000)
    unitig = genome[2000:3500]
    _, hh, _ = minimizers(unitig, 15, 5)
    index_sorted = jnp.asarray(np.sort(hh))
    bitmap = build_hash_bitmap(index_sorted)

    reads = [genome[1500:4000], random_genome(np.random.default_rng(5), 2500)]
    codes, lens = pad_batch(reads)
    exact = np.asarray(anchor_counts(codes, lens, index_sorted, 15, 5))
    approx = np.asarray(anchor_counts_bitmap(codes, lens, bitmap, 15, 5))
    # bitmap may only ADD false positives
    assert np.all(approx >= exact)
    # at this scale false positives are essentially zero
    assert np.all(approx - exact <= 2)
    assert approx[0] > 20 and approx[1] <= 2
