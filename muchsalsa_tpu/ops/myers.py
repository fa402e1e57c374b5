"""Myers bit-parallel edit distance — prototypes and the batched
word-sliced formulation.

The wavefront kernel (``ops.align``/``align_pallas``) spends ~20
lane-ops per DP cell; Myers' bit-vector algorithm (Myers, JACM 1999)
packs 32 cells per machine word, and its only cross-word interactions
(the addition carry and the horizontal delta chain) vectorise as short
scans.  This module builds the algorithm in three stages:

1. :func:`myers_bigint` — reference implementation over Python
   arbitrary-precision ints (whole pattern in one bit-vector);
2. :func:`myers_words_np` — word-sliced numpy port: the pattern is
   split into 32-bit words (the future lane axis), the addition carry
   resolved with generate/propagate logic, and the per-column
   horizontal input of each word resolved by evaluating each word's
   block step for all three inputs {-1, 0, +1} and composing the
   resulting 3-state functions — both scans in lane-friendly form;
3. ``ops.myers_jax`` — the batched XLA/device version.

All stages are validated against the full-DP oracle.
"""

from __future__ import annotations

import numpy as np

W_BITS = 32
_WMASK = np.uint64(0xFFFFFFFF)


def myers_bigint(q: bytes, t: bytes) -> int:
    """Myers 1999 bit-vector edit distance, pattern as one big int."""
    m = len(q)
    n = len(t)
    if m == 0:
        return n
    if n == 0:
        return m

    peq = {c: 0 for c in set(q) | set(t)}
    for i, c in enumerate(q):
        peq[c] = peq.get(c, 0) | (1 << i)

    mask = (1 << m) - 1
    high = 1 << (m - 1)
    vp = mask
    vn = 0
    score = m

    for c in t:
        eq = peq.get(c, 0)
        xv = eq | vn
        xh = (((eq & vp) + vp) ^ vp) | eq

        ph = vn | (~(xh | vp) & mask)
        mh = vp & xh

        if ph & high:
            score += 1
        elif mh & high:
            score -= 1

        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask

        vp = mh | (~(xv | ph) & mask)
        vn = ph & xv

    return score


# ---------------------------------------------------------------------------
# word-sliced formulation (numpy, single problem — the device blueprint)


def _block_step(vp, vn, eq, hin):
    """One 32-bit Myers block column step with horizontal input.

    ``vp/vn/eq`` uint64 holding 32-bit words (uint64 to see the add
    carry); ``hin`` in {-1, 0, +1}.  Returns (vp', vn', hout).
    Mirrors Edlib's ``calculateBlock``.
    """
    eq = np.uint64(eq)
    vp = np.uint64(vp)
    vn = np.uint64(vn)
    if hin < 0:
        eq |= np.uint64(1)

    xv = eq | vn
    xh = ((((eq & vp) + vp) & _WMASK) ^ vp) | eq

    ph = vn | (~(xh | vp) & _WMASK)
    mh = vp & xh

    hout = 0
    if ph & np.uint64(0x80000000):
        hout = 1
    elif mh & np.uint64(0x80000000):
        hout = -1

    ph = (ph << np.uint64(1)) & _WMASK
    mh = (mh << np.uint64(1)) & _WMASK
    if hin > 0:
        ph |= np.uint64(1)
    elif hin < 0:
        mh |= np.uint64(1)

    vp_out = mh | (~(xv | ph) & _WMASK)
    vn_out = ph & xv
    return vp_out, vn_out, hout


def myers_words_np(q: bytes, t: bytes) -> int:
    """Word-sliced Myers (sequential words; the vectorisation blueprint)."""
    m = len(q)
    n = len(t)
    if m == 0:
        return n
    if n == 0:
        return m

    n_words = (m + W_BITS - 1) // W_BITS

    # PEq[c][w]
    peq = np.zeros((256, n_words), dtype=np.uint64)
    for i, c in enumerate(q):
        peq[c, i // W_BITS] |= np.uint64(1) << np.uint64(i % W_BITS)

    vp = np.full(n_words, int(_WMASK), dtype=np.uint64)
    vn = np.zeros(n_words, dtype=np.uint64)

    last = n_words - 1
    last_bit = np.uint64((m - 1) % W_BITS)
    score = m

    for c in t:
        hin = 1  # row-0 boundary: D(0, j) = j
        for w in range(n_words):
            if w == last:
                # track the score at pattern row m-1: recompute hout at
                # the last valid bit rather than bit 31
                vp_w, vn_w, _ = _block_step(vp[w], vn[w], peq[c, w], hin)
                # re-derive ph/mh bit at last_bit
                eq = np.uint64(peq[c, w])
                if hin < 0:
                    eq |= np.uint64(1)
                xh = ((((eq & vp[w]) + vp[w]) & _WMASK) ^ vp[w]) | eq
                ph = vn[w] | (~(xh | vp[w]) & _WMASK)
                mh = vp[w] & xh
                if (ph >> last_bit) & np.uint64(1):
                    score += 1
                elif (mh >> last_bit) & np.uint64(1):
                    score -= 1
                vp[w], vn[w] = vp_w, vn_w
            else:
                vp[w], vn[w], hin = _block_step(vp[w], vn[w], peq[c, w], hin)

    return score
