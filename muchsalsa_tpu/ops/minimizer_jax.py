"""Batched minimizer extraction on the device (XLA).

Device twin of ``ops.minimizer`` (numpy host path): canonical k-mer
packing, fmix32 hashing, and leftmost-minimum window selection, all as
static-shape vector ops over a padded ``(R, L)`` read batch — the
seeding stage of the multi-chip mapper (reads shard over the mesh, the
unitig index is replicated; SURVEY.md §2.5 / BASELINE.json north star).

Equivalence with the host path is exact (32-bit arithmetic only) and
tested in ``tests/test_minimizer_jax.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def fmix32_jnp(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


@partial(jax.jit, static_argnames=("k", "w"))
def minimizer_sketch(codes: jnp.ndarray, lens: jnp.ndarray, k: int = 15, w: int = 5):
    """Minimizer sketch of a padded read batch.

    ``codes``: (R, L) uint8/int32, pad = 4 (non-ACGT).  Returns
    (selected, hashes, strands) all of shape (R, L - k + 1):
    ``selected`` marks k-mer start positions chosen as minimizers;
    ``hashes``/``strands`` are per-position canonical values.
    """
    R, L = codes.shape
    Lk = L - k + 1
    c = codes.astype(jnp.uint32)

    fwd = jnp.zeros((R, Lk), jnp.uint32)
    rc = jnp.zeros((R, Lk), jnp.uint32)
    bad = jnp.zeros((R, Lk), jnp.int32)
    for j in range(k):
        col = jax.lax.dynamic_slice_in_dim(c, j, Lk, axis=1)
        fwd = (fwd << 2) | (col & 3)
        rc = rc | (((jnp.uint32(3) - col) & 3) << jnp.uint32(2 * j))
        bad = bad + (col >= 4).astype(jnp.int32)

    pos = jnp.arange(Lk)[None, :]
    valid = (bad == 0) & (pos + k <= lens[:, None])

    canonical = jnp.minimum(fwd, rc)
    strand = fwd <= rc
    h = jnp.where(valid, fmix32_jnp(canonical), jnp.uint32(0xFFFFFFFF))

    lk_real = lens[:, None] - (k - 1)  # per-read number of k-mer positions

    if Lk <= w:
        amin = jnp.argmin(h, axis=1)
        selected = jax.nn.one_hot(amin, Lk, dtype=jnp.bool_)
    else:
        Wn = Lk - w + 1
        stacked = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(h, j, Wn, axis=1) for j in range(w)], axis=-1
        )
        amin = jnp.argmin(stacked, axis=-1)  # leftmost min per window
        # only windows fully inside the real read exist on the host path
        win_ok = jnp.arange(Wn)[None, :] <= (lk_real - w)
        selected = jnp.zeros((R, Lk), jnp.bool_)
        for j in range(w):
            hit = (amin == j) & win_ok
            selected = jax.lax.dynamic_update_slice_in_dim(
                selected,
                jax.lax.dynamic_slice_in_dim(selected, j, Wn, axis=1) | hit,
                j,
                axis=1,
            )
        # short reads (1 <= positions <= w): single leftmost global min
        small = (lk_real[:, 0] >= 1) & (lk_real[:, 0] <= w)
        gmin = jax.nn.one_hot(jnp.argmin(h, axis=1), Lk, dtype=jnp.bool_)
        selected = selected | (gmin & small[:, None])

    selected = selected & valid
    return selected, h, strand


_ONE = jnp.uint32(1)

BITMAP_LOG2_BITS = 28  # 32 MB bitmap; FP rate = |index| / 2^28


def build_hash_bitmap(index_hashes, log2_bits: int = BITMAP_LOG2_BITS):
    """Occupancy bitmap over (folded) minimizer hashes for O(1) device
    membership probes (vs the log-n gather chain of searchsorted).
    Built host-side (scatter-OR); returns a device array."""
    import numpy as _np

    h = _np.asarray(index_hashes, dtype=_np.uint32)
    folded = h & _np.uint32((1 << log2_bits) - 1)
    word = (folded >> _np.uint32(5)).astype(_np.int64)
    bit = (folded & _np.uint32(31)).astype(_np.uint32)
    table = _np.zeros(1 << (log2_bits - 5), dtype=_np.uint32)
    _np.bitwise_or.at(table, word, _np.uint32(1) << bit)
    return jnp.asarray(table)


@partial(jax.jit, static_argnames=("k", "w", "log2_bits"))
def anchor_counts_bitmap(
    codes: jnp.ndarray,
    lens: jnp.ndarray,
    bitmap: jnp.ndarray,
    k: int = 15,
    w: int = 5,
    log2_bits: int = BITMAP_LOG2_BITS,
):
    """Approximate per-read anchor counts via one bitmap gather per
    minimizer (false positives = |index| / 2^log2_bits; upper-bounds
    the exact :func:`anchor_counts`)."""
    selected, h, _ = minimizer_sketch(codes, lens, k, w)
    folded = h & jnp.uint32((1 << log2_bits) - 1)
    word = (folded >> 5).astype(jnp.int32)
    bit = (folded & 31).astype(jnp.uint32)
    probe = (bitmap[word] >> bit) & _ONE
    hit = (probe != 0) & selected
    return jnp.sum(hit, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "w"))
def anchor_counts(
    codes: jnp.ndarray,
    lens: jnp.ndarray,
    index_hashes: jnp.ndarray,
    k: int = 15,
    w: int = 5,
):
    """Per-read anchor counts against a replicated sorted minimizer index.

    The device half of the mapper's lookup stage: minimizer sketch of
    each read, then a sorted-array membership join against the unitig
    index (``jnp.searchsorted``).  Returns (R,) int32 anchor counts.
    """
    selected, h, _ = minimizer_sketch(codes, lens, k, w)
    pos = jnp.clip(jnp.searchsorted(index_hashes, h), 0, max(len(index_hashes) - 1, 0))
    hit = (index_hashes[pos] == h) & selected if len(index_hashes) else jnp.zeros_like(selected)
    return jnp.sum(hit, axis=1).astype(jnp.int32)
