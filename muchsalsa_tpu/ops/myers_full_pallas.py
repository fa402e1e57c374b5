"""Pallas TPU kernel for the *unbanded* batched Myers bit-parallel DP.

Companion to ``ops.myers_pallas`` (banded): computes the exact edit
distance over the full DP matrix, fusing the whole column loop that
``ops.myers_jax.myers_edit_distance`` expresses as ~60 XLA ops per
column (plus an associative scan across words for the horizontal
carry).  Here the carry chain just runs sequentially over the pattern
words inside a ``fori_loop`` — each step is still a full (8, 128) VPU
op covering 1024 problems, so the chain costs nothing in utilisation:

- problems are packed (8 sublanes x 128 lanes) per grid tile;
- VP/VN live in VMEM scratch as (n_words*8, 128) uint32, word ``w`` at
  sublanes [w*8, (w+1)*8) — all dynamic slices are 8-sublane aligned;
- the full PEq table for the tile sits in VMEM for the whole sweep
  (4 * n_words * 1024 * 4B, ~1 MB for 2 kb patterns); text columns are
  streamed 32 per grid step;
- the score is tracked at pattern row m-1 with a per-problem variable
  shift of the word containing it.

Exactness is verified against the oracle in
``tests/test_myers_pallas.py`` (interpret mode on CPU, compiled on
TPU); throughput is the bench.py headline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muchsalsa_tpu.ops.myers_jax import W_BITS, _ONE, _TOP, _FULL, _pack_peq

_SUB = 8
_LANES = 128
_TILE_P = _SUB * _LANES
_COLS = 32


def _kernel(n_ref, lw_ref, lb_ref, peq_ref, t_ref, score_ref,
            vp_ref, vn_ref, sc_ref, *, n_words: int):
    b = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    n = n_ref[0]                                   # effective n (0 if m == 0)
    last_word = lw_ref[0]
    last_bit = lb_ref[0].astype(jnp.uint32)

    @pl.when(b == 0)
    def _init():
        vp_ref[...] = jnp.full((n_words * _SUB, _LANES), _FULL, jnp.uint32)
        vn_ref[...] = jnp.zeros((n_words * _SUB, _LANES), jnp.uint32)
        sc_ref[...] = jnp.zeros((_SUB, _LANES), jnp.int32)  # delta vs m

    def column(col, carry_none):
        chars = t_ref[0, col]                      # (SUB, 128) int32
        j = _COLS * b + col + 1
        active = j <= n

        def word(w, hin, delta):
            ws = w * _SUB
            p0 = peq_ref[0, 0, ws:ws + _SUB]
            p1 = peq_ref[0, 1, ws:ws + _SUB]
            p2 = peq_ref[0, 2, ws:ws + _SUB]
            p3 = peq_ref[0, 3, ws:ws + _SUB]
            eq = jnp.where(
                chars == 0, p0,
                jnp.where(chars == 1, p1,
                          jnp.where(chars == 2, p2,
                                    jnp.where(chars == 3, p3, jnp.uint32(0)))))
            eq = eq | (hin < 0).astype(jnp.uint32)
            vp_w = vp_ref[ws:ws + _SUB]
            vn_w = vn_ref[ws:ws + _SUB]

            xv = eq | vn_w
            a = eq & vp_w
            xh = ((a + vp_w) ^ vp_w) | eq
            ph = vn_w | (~(xh | vp_w) & _FULL)
            mh = vp_w & xh
            hout = jnp.where(
                (ph & _TOP) != 0, 1,
                jnp.where((mh & _TOP) != 0, -1, 0)).astype(jnp.int32)

            # score step at pattern bit (m-1) of its word, pre-shift
            up = ((ph >> last_bit) & _ONE).astype(jnp.int32)
            dn = ((mh >> last_bit) & _ONE).astype(jnp.int32)
            delta = delta + jnp.where(last_word == w, up - dn, 0)

            ph = (ph << _ONE) | (hin > 0).astype(jnp.uint32)
            mh = (mh << _ONE) | (hin < 0).astype(jnp.uint32)
            vp_n = mh | (~(xv | ph) & _FULL)
            vn_n = ph & xv
            vp_ref[ws:ws + _SUB] = jnp.where(active, vp_n, vp_w)
            vn_ref[ws:ws + _SUB] = jnp.where(active, vn_n, vn_w)
            return hout, delta

        # static unroll over the pattern words (n_words is compile-time):
        # static slices lower to plain VMEM register accesses
        hin = jnp.ones((_SUB, _LANES), jnp.int32)
        delta = jnp.zeros((_SUB, _LANES), jnp.int32)
        for w in range(n_words):
            hin, delta = word(w, hin, delta)
        sc_ref[...] = sc_ref[...] + jnp.where(active, delta, 0)
        return carry_none

    jax.lax.fori_loop(0, _COLS, column, None)

    @pl.when(b == n_blocks - 1)
    def _emit():
        score_ref[0] = sc_ref[...]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("max_n", "interpret"))
def myers_edit_distance_pallas(
    q_codes: jnp.ndarray,   # (P, M) uint8/int32, pad = 5
    q_lens: jnp.ndarray,    # (P,)
    t_codes: jnp.ndarray,   # (P, N) uint8/int32, pad = 4
    t_lens: jnp.ndarray,    # (P,)
    max_n: int | None = None,
    interpret: bool = False,
):
    """Batched exact (unbanded) edit distance on a fused Pallas kernel.
    Bit-identical to ``myers_jax.myers_edit_distance``."""
    P, M = q_codes.shape
    N = t_codes.shape[1]
    cols = max_n if max_n is not None else N
    n_words = max((M + W_BITS - 1) // W_BITS, 1)
    n_blocks = max(_round_up(cols, _COLS) // _COLS, 1)
    Pp = _round_up(max(P, 1), _TILE_P)
    n_pt = Pp // _TILE_P

    m = q_lens.astype(jnp.int32)
    n = t_lens.astype(jnp.int32)

    peq = _pack_peq(q_codes, n_words)              # (P, 4, n_words)

    def tile(x, fill):
        pad = jnp.full((Pp - P,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0) if Pp > P else x

    n_eff = tile(jnp.where(m > 0, n, 0), 0)
    n_tiles = n_eff.reshape(n_pt, _SUB, _LANES)
    lw = tile(jnp.maximum(m - 1, 0) // W_BITS, 0).reshape(n_pt, _SUB, _LANES)
    lb = tile(jnp.maximum(m - 1, 0) % W_BITS, 0).reshape(n_pt, _SUB, _LANES)

    # full PEq per tile: (n_pt, 4, n_words*SUB, 128)
    peq_t = tile(peq, 0).transpose(1, 2, 0)        # (4, n_words, Pp)
    peq_t = peq_t.reshape(4, n_words, n_pt, _SUB, _LANES).transpose(2, 0, 1, 3, 4)
    peq_t = peq_t.reshape(n_pt, 4, n_words * _SUB, _LANES)

    t32 = tile(t_codes.astype(jnp.int32), 4)
    Nc = n_blocks * _COLS
    t_padded = jnp.full((Pp, Nc), 4, jnp.int32)
    t_padded = jax.lax.dynamic_update_slice(t_padded, t32[:, :Nc], (0, 0))
    t_blocks = t_padded.T.reshape(n_blocks, _COLS, n_pt * _SUB, _LANES)

    score = pl.pallas_call(
        partial(_kernel, n_words=n_words),
        out_shape=jax.ShapeDtypeStruct((n_pt, _SUB, _LANES), jnp.int32),
        grid=(n_pt, n_blocks),
        in_specs=[
            pl.BlockSpec((1, _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_words * _SUB, _LANES),
                         lambda p, b: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _COLS, _SUB, _LANES), lambda p, b: (b, 0, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, _LANES), lambda p, b: (p, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_words * _SUB, _LANES), jnp.uint32),
            pltpu.VMEM((n_words * _SUB, _LANES), jnp.uint32),
            pltpu.VMEM((_SUB, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(n_tiles, lw, lb, peq_t, t_blocks)

    score = score.reshape(Pp)[:P] + m              # delta accumulated vs m
    return jnp.where(m > 0, score, n).astype(jnp.int32)
