"""De Bruijn extension tables on the device (XLA).

Device leg of the DBG unitig walk (``pipeline.dbg.UnitigBuilder`` — the
native replacement for the reference's external ``abyss-pe``,
pipeline/pipeline.sh:153-159): for every canonical k-mer in the sorted
set, the 8 possible extensions (4 forward bases + 4 backward bases) are
canonicalised and membership-joined against the set in one batched
static-shape computation — the random-access-heavy part of the walk.
The serial path stitching stays on the host
(``pipeline.dbg.build_unitigs_from_ext``) driven by these tables with
O(1) lookups per step.

Values are 2k-bit packings (k <= 31) split across two uint32 lanes
(hi = value >> 32, lo = value & 0xFFFFFFFF) — x64 stays disabled.
Reverse complement is a word-level 2-bit-field reversal (three
mask-shift rounds + a halfword swap per lane, then a 64-bit funnel
shift), and the membership join is a static ``ceil(log2 N)``-round
binary search over the sorted (hi, lo) arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_M2 = jnp.uint32(0x33333333)
_M4 = jnp.uint32(0x0F0F0F0F)
_M8 = jnp.uint32(0x00FF00FF)


def _rev2_u32(x):
    """Reverse the sixteen 2-bit fields of each uint32 lane."""
    x = ((x & _M2) << 2) | ((x >> 2) & _M2)
    x = ((x & _M4) << 4) | ((x >> 4) & _M4)
    x = ((x & _M8) << 8) | ((x >> 8) & _M8)
    return (x << 16) | (x >> 16)


def _revcomp(hi, lo, k: int):
    """Reverse complement of 2k-bit (hi, lo) values (k static)."""
    mask_hi = jnp.uint32((1 << max(2 * k - 32, 0)) - 1)
    hi_c = (~hi) & (mask_hi if 2 * k > 32 else jnp.uint32(0))
    lo_c = ~lo
    y_hi = _rev2_u32(lo_c)
    y_lo = _rev2_u32(hi_c)
    s = 64 - 2 * k
    if s == 0:
        return y_hi, y_lo
    if s < 32:
        rc_hi = y_hi >> s
        rc_lo = (y_lo >> s) | (y_hi << (32 - s))
    else:
        rc_hi = jnp.zeros_like(y_hi)
        rc_lo = y_hi >> (s - 32) if s > 32 else y_hi
    if 2 * k <= 32:
        rc_hi = jnp.zeros_like(rc_hi)
    return rc_hi, rc_lo


def _canon(hi, lo, k: int):
    rc_hi, rc_lo = _revcomp(hi, lo, k)
    lt = (rc_hi < hi) | ((rc_hi == hi) & (rc_lo < lo))
    return jnp.where(lt, rc_hi, hi), jnp.where(lt, rc_lo, lo)


def _search(hi_q, lo_q, hi_s, lo_s, rounds: int, rank=None,
            rank_log2: int = 0):
    """Index of (hi_q, lo_q) in the sorted (hi_s, lo_s) arrays, -1 when
    absent.  Static-round binary search (one gather pair per round);
    with a ``rank`` table over the value's top ``rank_log2`` bits the
    search is bounded to one bucket, cutting ``rounds`` from log2(N)
    to log2(max bucket) — the unrolled 8 x 24-round form was a server
    compile bomb (>20 min; same mechanism as docs/DESIGN.md 4b)."""
    H = hi_s.shape[0]
    if rank is not None and rank_log2 > 0:
        bkt = (hi_q >> jnp.uint32(32 - rank_log2)).astype(jnp.int32)
        lo_b = rank[bkt]
        hi_b = rank[bkt + 1]
    else:
        lo_b = jnp.zeros(hi_q.shape, jnp.int32)
        hi_b = jnp.full(hi_q.shape, H, jnp.int32)
    for _ in range(rounds):
        mid = (lo_b + hi_b) >> 1
        safe = jnp.clip(mid, 0, H - 1)
        mh = hi_s[safe]
        ml = lo_s[safe]
        less = (mh < hi_q) | ((mh == hi_q) & (ml < lo_q))
        go_right = less & (lo_b < hi_b)
        lo_b = jnp.where(go_right, mid + 1, lo_b)
        hi_b = jnp.where((~go_right) & (lo_b < hi_b), mid, hi_b)
    idx = jnp.clip(lo_b, 0, H - 1)
    found = (hi_s[idx] == hi_q) & (lo_s[idx] == lo_q)
    return jnp.where(found, idx, -1)


@partial(jax.jit, static_argnames=("k", "rounds", "rank_log2"))
def ext_indices_chunk(
    hi_c: jnp.ndarray,   # (C,) uint32 — chunk of canonical k-mers
    lo_c: jnp.ndarray,   # (C,)
    hi_s: jnp.ndarray,   # (N,) uint32 — full sorted set (device-resident)
    lo_s: jnp.ndarray,   # (N,)
    k: int,
    rounds: int,
    rank: jnp.ndarray | None = None,  # (2^rank_log2 + 1,) int32
    rank_log2: int = 0,
):
    """(C, 8) int32 — for each k-mer, the set index of the canonical
    form of extension j (j = base for forward, 4 + base for backward),
    or -1.  Matches ``pipeline.dbg.UnitigBuilder._extensions`` on the
    canonical orientation exactly."""
    outs = []
    for b in range(4):
        # forward: ((v << 2) | b) & mask_2k
        f_lo = (lo_c << 2) | jnp.uint32(b)
        if 2 * k > 32:
            mask_hi = jnp.uint32((1 << (2 * k - 32)) - 1)
            f_hi = ((hi_c << 2) | (lo_c >> 30)) & mask_hi
        else:
            f_hi = jnp.zeros_like(hi_c)
            if 2 * k < 32:
                f_lo = f_lo & jnp.uint32((1 << (2 * k)) - 1)
        ch, cl = _canon(f_hi, f_lo, k)
        outs.append(_search(ch, cl, hi_s, lo_s, rounds,
                            rank=rank, rank_log2=rank_log2))
    for b in range(4):
        # backward: (v >> 2) | (b << (2k-2))
        p_lo = (lo_c >> 2) | (hi_c << 30)
        p_hi = hi_c >> 2
        sh = 2 * k - 2
        if sh >= 32:
            p_hi = p_hi | (jnp.uint32(b) << (sh - 32))
        else:
            p_lo = p_lo | (jnp.uint32(b) << sh)
        ch, cl = _canon(p_hi, p_lo, k)
        outs.append(_search(ch, cl, hi_s, lo_s, rounds,
                            rank=rank, rank_log2=rank_log2))
    return jnp.stack(outs, axis=1)


def ext_indices_device(vals: np.ndarray, k: int,
                       chunk: int = 1 << 20) -> np.ndarray:
    """(N, 8) int32 extension-index table for the sorted uint64
    canonical k-mer array ``vals`` (the random-access half of the DBG
    walk, batched on the device)."""
    N = len(vals)
    if N == 0:
        return np.zeros((0, 8), dtype=np.int32)
    hi_all = (vals >> np.uint64(32)).astype(np.uint32)
    lo_all = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi_s = jnp.asarray(hi_all)
    lo_s = jnp.asarray(lo_all)
    # rank table over the top bits of hi bounds each search to one
    # bucket: rounds drops from log2(N) (~24 — whose 8 x 24-round
    # unrolled form was a >20 min server compile) to log2(max bucket)
    # (~5).  Only meaningful when hi carries value bits (2k > 32).
    rank_log2 = 22 if 2 * k > 32 and N > (1 << 16) else 0
    if rank_log2:
        bkt = (hi_all >> np.uint32(32 - rank_log2)).astype(np.int64)
        counts = np.bincount(bkt, minlength=1 << rank_log2)
        rank_np = np.zeros((1 << rank_log2) + 1, dtype=np.int32)
        np.cumsum(counts, out=rank_np[1:])
        rank = jnp.asarray(rank_np)
        rounds = max(int(np.ceil(np.log2(int(counts.max()) + 1))), 1)
    else:
        rank = None
        rounds = max(int(np.ceil(np.log2(N + 1))), 1)
    out = np.empty((N, 8), dtype=np.int32)
    pulls = []
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        # pad to the full chunk width so every batch reuses one shape
        pad = chunk - (e - s)
        hi_c = jnp.asarray(np.pad(hi_all[s:e], (0, pad)))
        lo_c = jnp.asarray(np.pad(lo_all[s:e], (0, pad)))
        pulls.append((s, e, ext_indices_chunk(
            hi_c, lo_c, hi_s, lo_s, k=k, rounds=rounds,
            rank=rank, rank_log2=rank_log2)))
    for s, e, dev in pulls:
        out[s:e] = np.asarray(dev)[: e - s]
    return out
