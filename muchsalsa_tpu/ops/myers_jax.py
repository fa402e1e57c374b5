"""Batched Myers bit-parallel edit distance for the device (XLA).

Word-sliced Myers 1999 / Edlib-style block computation, data-parallel
over problems: the pattern's 32-bit words live on a (P, W) lane axis,
one ``lax.scan`` step per text column.  Cross-word structure per column:

- the block addition is word-local (carries flow between words only
  through the horizontal deltas), so no multi-word carry chain;
- each word's horizontal output ``hout`` depends on its horizontal
  input ``hin`` *only* through the ``Eq |= (hin < 0)`` bit, so two
  evaluations (hin >= 0 / hin < 0) cover all cases and the hin chain
  resolves with a log2(W) function-composition scan over 2-variant
  maps;
- the score is tracked at pattern bit (m-1) of word (m-1)//32 with
  per-problem one-hot selection.

~60 vector ops per column on (P, W) arrays versus ~20 per row on the
(P, B) wavefront — at 32 DP cells per lane-word this is the
throughput kernel; exactness is verified against the oracle and the
scalar prototypes in ``tests/test_myers.py``.  Unlike the banded
wavefront it computes the *unbanded* distance (no band guard needed).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

W_BITS = 32
_ONE = np.uint32(1)
_TOP = np.uint32(0x80000000)
_FULL = np.uint32(0xFFFFFFFF)


def _pack_peq(q_codes: jnp.ndarray, n_words: int) -> jnp.ndarray:
    """(P, M) codes -> PEq (P, 4, W) uint32 bit masks."""
    P, M = q_codes.shape
    Mp = n_words * W_BITS
    pad = jnp.full((P, Mp - M), 5, dtype=q_codes.dtype) if Mp > M else None
    qp = jnp.concatenate([q_codes, pad], axis=1) if pad is not None else q_codes
    qp = qp.reshape(P, n_words, W_BITS)
    weights = (_ONE << jnp.arange(W_BITS, dtype=jnp.uint32))  # bit i%32
    peq = []
    for c in range(4):
        bits = (qp == c).astype(jnp.uint32)
        peq.append(jnp.sum(bits * weights[None, None, :], axis=2, dtype=jnp.uint32))
    return jnp.stack(peq, axis=1)  # (P, 4, W)


def _half_step(eq, vp, vn):
    """Myers block core for a fixed Eq: returns (xv, xh, ph, mh)."""
    xv = eq | vn
    a = eq & vp
    xh = (((a + vp) & _FULL) ^ vp) | eq
    ph = vn | (~(xh | vp) & _FULL)
    mh = vp & xh
    return xv, ph, mh


@partial(jax.jit, static_argnames=("max_n",))
def myers_edit_distance(
    q_codes: jnp.ndarray,   # (P, M) uint8/int32, pad = 5
    q_lens: jnp.ndarray,    # (P,)
    t_codes: jnp.ndarray,   # (P, N) uint8/int32, pad = 4
    t_lens: jnp.ndarray,    # (P,)
    max_n: int | None = None,
):
    """Batched exact (unbanded) edit distance.  Returns (P,) int32."""
    P, M = q_codes.shape
    N = t_codes.shape[1]
    cols = max_n if max_n is not None else N
    n_words = max((M + W_BITS - 1) // W_BITS, 1)

    peq = _pack_peq(q_codes, n_words)              # (P, 4, W)
    m = q_lens.astype(jnp.int32)
    n = t_lens.astype(jnp.int32)

    last_word = jnp.maximum(m - 1, 0) // W_BITS    # (P,)
    last_bit = (jnp.maximum(m - 1, 0) % W_BITS).astype(jnp.uint32)
    word_idx = jnp.arange(n_words)[None, :]        # (1, W)
    lw_mask = word_idx == last_word[:, None]       # (P, W)

    t32 = t_codes.astype(jnp.int32)

    # derive the initial carry from the inputs (not fresh constants) so
    # the varying-axis metadata matches under shard_map
    vp0 = jnp.full_like(peq[:, 0], _FULL)
    vn0 = jnp.zeros_like(peq[:, 0])
    score0 = m.astype(jnp.int32)

    def column(carry, j):
        vp, vn, score = carry
        c = jax.lax.dynamic_slice_in_dim(t32, j, 1, axis=1)  # (P, 1)
        eq = jnp.where(
            c == 0, peq[:, 0],
            jnp.where(c == 1, peq[:, 1],
                      jnp.where(c == 2, peq[:, 2],
                                jnp.where(c == 3, peq[:, 3], jnp.uint32(0)))),
        )  # (P, W)

        # two hin classes: >= 0 (eq as-is) and < 0 (eq | 1)
        xv_a, ph_a, mh_a = _half_step(eq, vp, vn)
        eq_b = eq | _ONE
        xv_b, ph_b, mh_b = _half_step(eq_b, vp, vn)

        def hout_of(ph, mh):
            return jnp.where(
                (ph & _TOP) != 0, 1, jnp.where((mh & _TOP) != 0, -1, 0)
            ).astype(jnp.int32)

        hout_a = hout_of(ph_a, mh_a)  # hin >= 0
        hout_b = hout_of(ph_b, mh_b)  # hin < 0

        # resolve the hin chain: represent each word's map by the pair
        # (out_if_hin_neg, out_if_hin_nonneg) and compose with a scan
        def compose(f, g):
            # g after f: pick g's branch by f's output sign
            f_neg, f_nn = f
            g_neg, g_nn = g
            return (
                jnp.where(f_neg < 0, g_neg, g_nn),
                jnp.where(f_nn < 0, g_neg, g_nn),
            )

        maps = (hout_b, hout_a)
        comp = jax.lax.associative_scan(compose, maps, axis=1)
        # hin of word w = (f_{w-1} ∘ ... ∘ f_0)(+1); boundary hin_0 = +1
        hin_nn = comp[1]  # (P, W): output after words 0..w given +1 input
        hin = jnp.concatenate(
            [jnp.ones((P, 1), jnp.int32), hin_nn[:, :-1]], axis=1
        )

        neg = hin < 0
        pos = hin > 0
        xv = jnp.where(neg, xv_b, xv_a)
        ph = jnp.where(neg, ph_b, ph_a)
        mh = jnp.where(neg, mh_b, mh_a)

        # score step at pattern bit (m-1) of the last word, pre-shift
        ph_l = jnp.sum(jnp.where(lw_mask, ph, jnp.uint32(0)), axis=1, dtype=jnp.uint32)
        mh_l = jnp.sum(jnp.where(lw_mask, mh, jnp.uint32(0)), axis=1, dtype=jnp.uint32)
        up = ((ph_l >> last_bit) & _ONE).astype(jnp.int32)
        dn = ((mh_l >> last_bit) & _ONE).astype(jnp.int32)
        delta = up - dn

        ph = (ph << _ONE) | jnp.where(pos, _ONE, jnp.uint32(0))
        mh = (mh << _ONE) | jnp.where(neg, _ONE, jnp.uint32(0))

        vp_n = mh | (~(xv | ph) & _FULL)
        vn_n = ph & xv

        active = (j < n) & (m > 0)  # (P,)
        act_w = active[:, None]
        vp = jnp.where(act_w, vp_n, vp)
        vn = jnp.where(act_w, vn_n, vn)
        score = jnp.where(active, score + delta, score)
        return (vp, vn, score), None

    (vp, vn, score), _ = jax.lax.scan(
        column, (vp0, vn0, score0), jnp.arange(cols)
    )
    # m == 0: distance is n
    return jnp.where(m > 0, score, n).astype(jnp.int32)


@partial(jax.jit, static_argnames=("window_words", "max_n"))
def myers_banded(
    q_codes: jnp.ndarray,   # (P, M) uint8/int32, pad = 5
    q_lens: jnp.ndarray,    # (P,)
    t_codes: jnp.ndarray,   # (P, N) uint8/int32, pad = 4
    t_lens: jnp.ndarray,    # (P,)
    window_words: int = 8,
    max_n: int | None = None,
):
    """Banded batched Myers: a sliding window of ``window_words`` blocks
    per column (band = window_words*32 diagonals, shared geometry across
    the batch — problems whose length difference exceeds the shared band
    return -1).  Exact when the optimal path stays in the band; an upper
    bound otherwise.  ~W_full/window_words times less work than
    :func:`myers_edit_distance`.
    """
    P, M = q_codes.shape
    N = t_codes.shape[1]
    cols = max_n if max_n is not None else N
    WB = window_words
    band_rows = WB * W_BITS

    m = q_lens.astype(jnp.int32)
    n = t_lens.astype(jnp.int32)
    diff = n - m

    # shared band geometry covering every problem's k=0 start and k=diff end
    k_min = jnp.minimum(0, jnp.min(diff))
    k_max = jnp.maximum(0, jnp.max(diff))
    spread = k_max - k_min
    slack = jnp.maximum((band_rows - 1 - spread) // 2, 0)
    klo = k_min - slack
    khi = klo + band_rows - 1
    in_band = (diff - klo >= W_BITS) & (khi - diff >= W_BITS) & (m > 0) & (n > 0)

    n_words = max((M + W_BITS - 1) // W_BITS, WB) + WB + 2
    peq = _pack_peq(q_codes, n_words)              # (P, 4, W_full)
    t32 = t_codes.astype(jnp.int32)

    vp0 = jnp.full_like(peq[:, 0], _FULL)
    vn0 = jnp.zeros_like(peq[:, 0])
    # score at the window-bottom row of column 0
    score0 = jnp.full((P,), band_rows, jnp.int32) + (m - m)

    def column(carry, j):
        # NOTE: the +32-per-window-advance score bookkeeping happens in
        # closed form after the scan (32 * wb(n_p) per problem), because
        # the shared window keeps advancing after short problems finish
        vp, vn, score, wb = carry
        j = j.astype(jnp.int32)
        target_wb = (jnp.maximum(0, j - khi) // W_BITS).astype(jnp.int32)
        target_wb = jnp.minimum(target_wb, n_words - WB)
        wb = target_wb

        c = jax.lax.dynamic_slice_in_dim(t32, j - 1, 1, axis=1)  # (P, 1)
        eq_full = jnp.where(
            c == 0, peq[:, 0],
            jnp.where(c == 1, peq[:, 1],
                      jnp.where(c == 2, peq[:, 2],
                                jnp.where(c == 3, peq[:, 3], jnp.uint32(0)))),
        )
        eq = jax.lax.dynamic_slice_in_dim(eq_full, wb, WB, axis=1)
        vp_w = jax.lax.dynamic_slice_in_dim(vp, wb, WB, axis=1)
        vn_w = jax.lax.dynamic_slice_in_dim(vn, wb, WB, axis=1)

        xv_a, ph_a, mh_a = _half_step(eq, vp_w, vn_w)
        xv_b, ph_b, mh_b = _half_step(eq | _ONE, vp_w, vn_w)

        def hout_of(ph, mh):
            return jnp.where(
                (ph & _TOP) != 0, 1, jnp.where((mh & _TOP) != 0, -1, 0)
            ).astype(jnp.int32)

        hout_a = hout_of(ph_a, mh_a)
        hout_b = hout_of(ph_b, mh_b)

        def compose(f, g):
            f_neg, f_nn = f
            g_neg, g_nn = g
            return (
                jnp.where(f_neg < 0, g_neg, g_nn),
                jnp.where(f_nn < 0, g_neg, g_nn),
            )

        comp = jax.lax.associative_scan(compose, (hout_b, hout_a), axis=1)
        hin_nn = comp[1]
        hin = jnp.concatenate(
            [jnp.ones((P, 1), jnp.int32), hin_nn[:, :-1]], axis=1
        )

        neg = hin < 0
        pos = hin > 0
        xv = jnp.where(neg, xv_b, xv_a)
        ph = jnp.where(neg, ph_b, ph_a)
        mh = jnp.where(neg, mh_b, mh_a)

        # bottom-block hout moves the tracked window-bottom score
        delta = jnp.where(neg[:, -1], hout_b[:, -1], hout_a[:, -1])

        ph = (ph << _ONE) | jnp.where(pos, _ONE, jnp.uint32(0))
        mh = (mh << _ONE) | jnp.where(neg, _ONE, jnp.uint32(0))

        vp_n = mh | (~(xv | ph) & _FULL)
        vn_n = ph & xv

        active = (j <= n) & in_band
        act_w = active[:, None]
        vp_n = jnp.where(act_w, vp_n, vp_w)
        vn_n = jnp.where(act_w, vn_n, vn_w)
        vp = jax.lax.dynamic_update_slice_in_dim(vp, vp_n, wb, axis=1)
        vn = jax.lax.dynamic_update_slice_in_dim(vn, vn_n, wb, axis=1)
        score = jnp.where(active, score + delta, score)
        return (vp, vn, score, wb), None

    (vp, vn, score, wb), _ = jax.lax.scan(
        column,
        (vp0, vn0, score0, jnp.zeros((), jnp.int32)),
        jnp.arange(1, cols + 1, dtype=jnp.int32),
    )

    # per-problem effective window at each problem's own last column n_p
    wb_p = jnp.minimum(
        jnp.maximum(0, n - khi) // W_BITS, n_words - WB
    ).astype(jnp.int32)                               # (P,)
    score = score + wb_p * W_BITS                     # window-advance bookkeeping
    bottom_word = wb_p + WB - 1                       # (P,)

    # walk from the window bottom row up to pattern row m-1:
    # score -= popcount(VP bits in rows (m-1, bottom]) - popcount(VN ...)
    word_idx = jnp.arange(n_words)[None, :]
    row_lo = (word_idx * W_BITS)                      # first row of word
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, n_words, W_BITS), 2)
    rows = row_lo[:, :, None] + lane.astype(jnp.int32)  # (1, W, 32)
    in_range = (
        (rows > (m[:, None, None] - 1))
        & (word_idx[:, :, None] <= bottom_word[:, None, None])
        & (word_idx[:, :, None] >= wb_p[:, None, None])
    )
    vp_bits = ((vp[:, :, None] >> lane) & _ONE) != 0
    vn_bits = ((vn[:, :, None] >> lane) & _ONE) != 0
    adj = jnp.sum(
        jnp.where(in_range & vp_bits, -1, 0) + jnp.where(in_range & vn_bits, 1, 0),
        axis=(1, 2),
    ).astype(jnp.int32)
    score = score + adj

    # the band must also have reached the pattern end
    bottom_row = (bottom_word + 1) * W_BITS - 1
    ok = in_band & (bottom_row >= m - 1) & (m - 1 >= wb_p * W_BITS - 1)
    return jnp.where(ok, score, -1).astype(jnp.int32)
