"""Device k-mer counting vs the host counter (jellyfish-count twin)."""

import numpy as np

from muchsalsa_tpu.ops.kmer_jax import count_kmers_device, kmer_hi_lo_batch
from muchsalsa_tpu.pipeline.kmer import count_kmers, kmer_values64
from muchsalsa_tpu.testing.simulate import random_genome
from muchsalsa_tpu.utils.seq import encode_2bit


def test_kmer_hi_lo_matches_values64():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    k = 25
    seq = bytearray(random_genome(rng, 500))
    seq[100] = ord("N")  # invalid base
    seq = bytes(seq)
    codes = encode_2bit(seq)
    ref_vals, ref_valid = kmer_values64(codes, k)

    L = len(codes)
    hi, lo, valid = kmer_hi_lo_batch(
        jnp.asarray(codes[None, :]), jnp.asarray([L], np.int32), k)
    got = (np.asarray(hi[0], np.uint64) << np.uint64(32)) | np.asarray(
        lo[0], np.uint64)
    np.testing.assert_array_equal(np.asarray(valid[0]), ref_valid)
    np.testing.assert_array_equal(got[ref_valid], ref_vals[ref_valid])


def test_count_kmers_device_matches_host():
    rng = np.random.default_rng(11)
    seqs = [random_genome(rng, int(rng.integers(40, 3000))) for _ in range(60)]
    seqs.append(seqs[0])           # exact duplicate sequence
    seqs.append(seqs[1][10:900])   # substring: shared k-mers
    seqs.append(b"ACG")            # below k
    k = 25
    host_u, host_c = count_kmers(seqs, k)
    dev_u, dev_c = count_kmers_device(seqs, k, chunk_bases=1 << 15,
                                      row_len=1 << 10)
    np.testing.assert_array_equal(dev_u, host_u)
    np.testing.assert_array_equal(dev_c, host_c)


def test_count_kmers_device_long_read_fragmentation():
    """A sequence longer than row_len must fragment with k-1 overlap and
    still count every k-mer exactly once."""
    rng = np.random.default_rng(3)
    seq = random_genome(rng, 5000)
    k = 21
    host_u, host_c = count_kmers([seq], k)
    dev_u, dev_c = count_kmers_device([seq], k, chunk_bases=1 << 12,
                                      row_len=512)
    np.testing.assert_array_equal(dev_u, host_u)
    np.testing.assert_array_equal(dev_c, host_c)


def test_count_kmers_device_empty():
    u, c = count_kmers_device([], 25)
    assert len(u) == 0 and len(c) == 0
