"""Full read->unitig mapping on the device (XLA): the TPU replacement
for the reference's external ``minimap2`` stage (pipeline.sh:163) as a
single static-shape jit — not just the seed-count filter of
``ops.minimizer_jax``.

Mirrors ``pipeline.mapper.map_read`` exactly (tests assert identical
Mapping sets): minimizer sketch, sorted-index membership join, CSR
anchor expansion, global (unitig,strand)/diagonal sort, band
segmentation, per-segment stats.  The ragged parts become static-shape
TPU idioms:

- hit positions compact into ``max_pos`` slots per read via a sort
  (ragged -> padded);
- each hit expands to at most ``max_per_hit`` index entries (reads
  hitting ultra-repetitive minimizers beyond the cap are flagged in
  ``overflow`` so callers can fall back to the host path);
- ``reduceat`` segment stats become reverse segmented scans
  (``lax.associative_scan``) whose value at each segment start is the
  full-segment reduction;
- per-read results compact into ``max_hits`` Mapping slots.

Throughput and the multi-chip wrapper live in ``parallel/sharded.py``
(`sharded_map_reads`): reads shard over the mesh, the index is
replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from muchsalsa_tpu.ops.minimizer_jax import minimizer_sketch

_I32_MAX = jnp.int32(2**31 - 1)


def _seg_reduce_to_starts(vals, new_seg, combine, axis=1):
    """Reverse segmented inclusive scan: returns an array where each
    segment-start position holds the reduction of its whole segment
    (other positions hold suffix reductions — callers ignore them).
    ``new_seg[i]`` marks i as the first element of a segment."""
    S = vals.shape[axis]
    rev = lambda x: jnp.flip(x, axis=axis)
    # reversed element j starts a reversed segment iff its original
    # element is the last of its original segment
    last = jnp.concatenate(
        [new_seg[:, 1:], jnp.ones_like(new_seg[:, :1])], axis=1)
    flags_rev = rev(last)

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, combine(va, vb))

    _, scanned = jax.lax.associative_scan(op, (flags_rev, rev(vals)), axis=axis)
    return rev(scanned)


RANK_LOG2 = 20  # rank-table buckets over the 32-bit hash space


def build_join_tables(idx_hashes) -> tuple:
    """Host-side auxiliary tables for the device join: the occupancy
    bitmap (see ``minimizer_jax.build_hash_bitmap``) plus a rank table
    ``rank[b] = lower_bound(hashes, b << (32-RANK_LOG2))`` that bounds
    the binary search to one bucket (~5 rounds instead of 20 for a
    1M-entry index), and the static round count for the largest bucket.

    Returns (bitmap, rank_table, rounds) — pass to
    :func:`map_reads_device`.
    """
    import numpy as _np

    from muchsalsa_tpu.ops.minimizer_jax import build_hash_bitmap

    h = _np.asarray(idx_hashes, dtype=_np.uint32)
    bounds = (_np.arange(1 << RANK_LOG2, dtype=_np.uint64)
              << (32 - RANK_LOG2)).astype(_np.uint32)
    rank = _np.searchsorted(h, bounds).astype(_np.int32)
    rank = _np.concatenate([rank, _np.int32([len(h)])])
    max_gap = int(_np.max(_np.diff(rank))) if len(h) else 0
    rounds = max(int(_np.ceil(_np.log2(max_gap + 1))), 1)
    return build_hash_bitmap(h), jnp.asarray(rank), rounds


@partial(jax.jit, static_argnames=(
    "k", "w", "bandwidth", "min_anchor_count", "min_chain_score",
    "max_pos", "max_per_hit", "max_hits", "log2_bits", "join_rounds"))
def map_reads_device(
    codes: jnp.ndarray,        # (R, L) uint8/int32, pad = 4
    lens: jnp.ndarray,         # (R,)
    idx_hashes: jnp.ndarray,   # (H,) uint32, sorted
    idx_offsets: jnp.ndarray,  # (H+1,) int32/int64 CSR offsets
    entry_unitig: jnp.ndarray, # (E,) int32
    entry_pos: jnp.ndarray,    # (E,) int32
    entry_strand: jnp.ndarray, # (E,) bool
    bitmap: jnp.ndarray | None = None,  # build_join_tables(idx_hashes)[0]
    rank_table: jnp.ndarray | None = None,  # build_join_tables(...)[1]
    k: int = 15,
    w: int = 5,
    bandwidth: int = 500,
    min_anchor_count: int = 4,
    min_chain_score: int = 100,
    max_pos: int = 512,
    max_per_hit: int = 4,
    max_hits: int = 64,
    log2_bits: int = 28,
    join_rounds: int = 0,  # rounds for the rank-bounded search (static)
):
    """Map every read against the index on the device.

    Returns a dict of (R, max_hits) int32 arrays (``unitig``,
    ``strand``, ``qs``, ``qe``, ``ts``, ``te``, ``matches``,
    ``n_anchors``), plus ``n_hits`` (R,) and ``overflow`` (R,) flags
    (anchor budget exceeded -> host fallback for exactness).

    ``bitmap`` (from :func:`minimizer_jax.build_hash_bitmap`) prunes
    the expensive sorted-index binary search to the ~``max_pos``
    candidate positions per read: one O(1) occupancy gather per
    minimizer replaces log2(H) gathers per position; false positives
    are eliminated by the exact membership check on the compacted
    candidates, so results are unchanged.
    """
    R, L = codes.shape
    Lk = L - k + 1
    H = idx_hashes.shape[0]
    A = max_per_hit
    max_pos = min(max_pos, Lk)  # short batches can't exceed Lk positions
    S = max_pos * A             # anchor slots per read

    selected, h, strand = minimizer_sketch(codes, lens, k, w)   # (R, Lk)

    if bitmap is not None:
        # O(1) occupancy probe per minimizer; false positives are
        # eliminated by the exact membership check below. overflow is
        # slightly conservative (counts surviving FPs).
        folded = h & jnp.uint32((1 << log2_bits) - 1)
        probe = (bitmap[(folded >> 5).astype(jnp.int32)]
                 >> (folded & 31).astype(jnp.uint32)) & jnp.uint32(1)
        cand = selected & (probe != 0)
    else:
        # exact prefilter: log2(H) gathers over every position (slow —
        # pass a bitmap for the production path)
        loc0 = jnp.clip(jnp.searchsorted(idx_hashes, h), 0, max(H - 1, 0))
        cand = (idx_hashes[loc0] == h) & selected if H else jnp.zeros_like(selected)

    # ragged -> padded: compact candidate positions into max_pos slots
    pos_ids = jax.lax.broadcasted_iota(jnp.int32, (R, Lk), 1)
    sort_key = jnp.where(cand, pos_ids, _I32_MAX)
    pos_sorted = jax.lax.sort(sort_key, dimension=1)[:, :max_pos]   # (R, max_pos)
    pos_valid = pos_sorted < _I32_MAX
    pos_safe = jnp.where(pos_valid, pos_sorted, 0)
    n_cand = jnp.sum(cand.astype(jnp.int32), axis=1)

    take = lambda arr: jnp.take_along_axis(arr, pos_safe, axis=1)
    h_c = take(h)                            # (R, max_pos)
    strand_c = take(strand)
    t_c = pos_safe                           # anchor read position

    # exact membership join on the compacted candidates only.  With a
    # rank table the binary search is bounded to one rank bucket
    # (join_rounds ~ log2(max bucket) instead of log2(H)).
    if rank_table is not None and join_rounds > 0 and H:
        b = (h_c >> jnp.uint32(32 - RANK_LOG2)).astype(jnp.int32)
        lo_b = rank_table[b]
        hi_b = rank_table[b + 1]
        for _ in range(join_rounds):
            mid = (lo_b + hi_b) // 2
            mv = idx_hashes[jnp.clip(mid, 0, H - 1)]
            go_right = (mv < h_c) & (lo_b < hi_b)
            hi_b = jnp.where((~go_right) & (lo_b < hi_b), mid, hi_b)
            lo_b = jnp.where(go_right, mid + 1, lo_b)
        loc = jnp.clip(lo_b, 0, H - 1)
    else:
        loc = jnp.clip(jnp.searchsorted(idx_hashes, h_c), 0, max(H - 1, 0))
    found = (idx_hashes[loc] == h_c) & pos_valid if H else jnp.zeros_like(pos_valid)
    lo_c = jnp.where(found, idx_offsets[loc].astype(jnp.int32), 0)
    cnt_full = jnp.where(
        found, idx_offsets[loc + 1].astype(jnp.int32) - lo_c, 0)
    cnt_c = jnp.minimum(cnt_full, A)

    overflow = (n_cand > max_pos) | jnp.any(cnt_full > A, axis=1)

    # expand to (R, max_pos, A) anchors; (unitig, strand) pack into one
    # int32 so the expansion costs 2 gathers per anchor instead of 3
    packed = entry_unitig * 2 + entry_strand.astype(jnp.int32)
    a_ids = jnp.arange(A, dtype=jnp.int32)[None, None, :]
    a_valid = a_ids < cnt_c[:, :, None]
    src = jnp.where(a_valid, lo_c[:, :, None] + a_ids, 0)
    pk = packed[src]
    au = pk // 2
    aq = entry_pos[src]
    arel = (pk % 2) == strand_c[:, :, None].astype(jnp.int32)
    at = jnp.broadcast_to(t_c[:, :, None], src.shape)

    key = jnp.where(a_valid, au * 2 + arel.astype(jnp.int32), _I32_MAX)
    diag = jnp.where(arel, at - aq, at + aq)
    key = key.reshape(R, S)
    diag = jnp.where(a_valid, diag, 0).reshape(R, S)
    aq = jnp.where(a_valid, aq, 0).reshape(R, S)
    at = jnp.where(a_valid, at, 0).reshape(R, S)

    # global per-read sort by ((unitig, strand), diagonal)
    key, diag, aq, at = jax.lax.sort(
        (key, diag, aq, at), dimension=1, num_keys=2)
    valid = key < _I32_MAX

    prev_key = jnp.concatenate([jnp.full((R, 1), -1, key.dtype), key[:, :-1]], axis=1)
    prev_diag = jnp.concatenate([diag[:, :1], diag[:, :-1]], axis=1)
    new_seg = (key != prev_key) | (diag - prev_diag > bandwidth)
    new_seg = new_seg.at[:, 0].set(True)

    q_min = _seg_reduce_to_starts(aq, new_seg, jnp.minimum)
    q_max = _seg_reduce_to_starts(aq, new_seg, jnp.maximum)
    t_min = _seg_reduce_to_starts(at, new_seg, jnp.minimum)
    t_max = _seg_reduce_to_starts(at, new_seg, jnp.maximum)
    ones = valid.astype(jnp.int32)
    seg_n = _seg_reduce_to_starts(ones, new_seg, jnp.add)

    # covered read bases: re-sort segments by t (seg ids are sorted, so
    # each segment keeps its slot range), clip gaps at k
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32), axis=1) - 1
    seg_id2, t2 = jax.lax.sort((seg_id, at), dimension=1, num_keys=2)
    prev_seg2 = jnp.concatenate(
        [jnp.full((R, 1), -1, seg_id2.dtype), seg_id2[:, :-1]], axis=1)
    first2 = seg_id2 != prev_seg2
    prev_t2 = jnp.concatenate([t2[:, :1], t2[:, :-1]], axis=1)
    gaps = jnp.where(first2, 0, jnp.minimum(t2 - prev_t2, k))
    covered = k + _seg_reduce_to_starts(gaps, first2, jnp.add)

    ok = (
        new_seg & valid
        & (seg_n >= min_anchor_count)
        & (covered >= min_chain_score)
    )

    # compact surviving segments into max_hits slots (position order =
    # (key, diag) order, matching the host path's emission order)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    hit_key = jnp.where(ok, slot_ids, _I32_MAX)
    hit_pos = jax.lax.sort(hit_key, dimension=1)[:, :max_hits]
    hit_valid = hit_pos < _I32_MAX
    hit_safe = jnp.where(hit_valid, hit_pos, 0)

    gather = lambda arr: jnp.where(
        hit_valid, jnp.take_along_axis(arr, hit_safe, axis=1), 0)
    n_hits = jnp.sum(ok.astype(jnp.int32), axis=1)
    overflow = overflow | (n_hits > max_hits)

    key_h = jnp.take_along_axis(key, hit_safe, axis=1)
    return {
        "unitig": jnp.where(hit_valid, key_h // 2, 0),
        "strand": jnp.where(hit_valid, key_h % 2, 0),
        "qs": gather(q_min),
        "qe": gather(q_max) + jnp.where(hit_valid, k, 0),
        "ts": gather(t_min),
        "te": gather(t_max) + jnp.where(hit_valid, k, 0),
        "matches": gather(covered),
        "n_anchors": gather(seg_n),
        "n_hits": jnp.minimum(n_hits, max_hits),
        "overflow": overflow,
    }
