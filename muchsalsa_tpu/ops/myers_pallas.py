"""Pallas TPU kernel for the banded batched Myers bit-parallel DP.

Same recurrence as ``ops.myers_jax.myers_banded`` (word-sliced Myers
1999 with a sliding ``window_words``-block band), hand-tiled so the
whole column loop fuses into one kernel instead of ~60 XLA ops + two
dynamic slices per text column:

- problems are packed (8 sublanes x 128 lanes) = 1024 per grid tile;
  each window word is an (8, 128) uint32 register, so one VPU op per
  recurrence step covers 1024 problems;
- band geometry is **static** (see ``_geometry``): the window-advance
  schedule ``wb(j)`` then advances by exactly one word at 32-column
  block boundaries, so the sliding window becomes a register shift at
  block start — no dynamic sublane slicing anywhere (which the Mosaic
  lowering can't prove safe);
- the horizontal carry chain across the WB window words runs
  sequentially (WB is 4-8), each step full-width over the tile;
- per-problem PEq window words and text columns are precomputed by XLA
  in the kernel's layout and streamed through VMEM by the Pallas
  pipeline, one 32-column block per grid step;
- the kernel returns the window-bottom score plus the final VP/VN
  window; the closed-form window-advance bookkeeping and the
  bottom-row -> row m-1 popcount walk stay in XLA (one-time cost).

Problems whose length difference falls outside the static band return
-1 (callers fall back to ``myers_edit_distance``).  Exactness when the
optimal path stays in the band is tested against the oracle in
``tests/test_myers_pallas.py`` (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muchsalsa_tpu.ops.myers_jax import W_BITS, _ONE, _TOP, _FULL, _pack_peq

_SUB = 8          # problems per sublane
_LANES = 128
_TILE_P = _SUB * _LANES   # problems per grid tile
_COLS = 32        # text columns per grid block (= one word of window advance)


def _geometry(window_words: int) -> tuple[int, int, int]:
    """Static band geometry: (klo, khi, h) with khi ≡ 1 (mod 32) so the
    window advances exactly at 32-column block boundaries."""
    band_rows = window_words * W_BITS
    khi = W_BITS * (window_words // 2) + 1
    klo = khi - band_rows + 1
    h = (khi - 1) // W_BITS          # wb of block b is clamp(b - h)
    return klo, khi, h


def _kernel(n_ref, peq_ref, t_ref, score_ref, vp_out_ref, vn_out_ref,
            vp_ref, vn_ref, sc_ref, *, WB: int, h: int, max_wb: int):
    b = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    n = n_ref[0]                                  # (SUB, 128) effective n

    @pl.when(b == 0)
    def _init():
        vp_ref[...] = jnp.full((WB * _SUB, _LANES), _FULL, jnp.uint32)
        vn_ref[...] = jnp.zeros((WB * _SUB, _LANES), jnp.uint32)
        sc_ref[...] = jnp.full((_SUB, _LANES), WB * W_BITS, jnp.int32)

    # window advance: shift words up one slot, fresh word at the bottom.
    # Frozen (finished) problems keep their window for the final walk.
    @pl.when((b > h) & (b <= h + max_wb))
    def _shift():
        j0 = _COLS * b + 1
        act = (j0 <= n)
        vp = vp_ref[...].reshape(WB, _SUB, _LANES)
        vn = vn_ref[...].reshape(WB, _SUB, _LANES)
        fresh_vp = jnp.full((1, _SUB, _LANES), _FULL, jnp.uint32)
        fresh_vn = jnp.zeros((1, _SUB, _LANES), jnp.uint32)
        vp_s = jnp.concatenate([vp[1:], fresh_vp], axis=0)
        vn_s = jnp.concatenate([vn[1:], fresh_vn], axis=0)
        vp_ref[...] = jnp.where(act[None], vp_s, vp).reshape(WB * _SUB, _LANES)
        vn_ref[...] = jnp.where(act[None], vn_s, vn).reshape(WB * _SUB, _LANES)

    def column(col, _):
        chars = t_ref[0, col]                     # (SUB, 128) int32
        j = _COLS * b + col + 1
        active = j <= n

        hin = jnp.ones((_SUB, _LANES), jnp.int32)
        delta = jnp.zeros((_SUB, _LANES), jnp.int32)
        for w in range(WB):
            p0 = peq_ref[0, 4 * w + 0]
            p1 = peq_ref[0, 4 * w + 1]
            p2 = peq_ref[0, 4 * w + 2]
            p3 = peq_ref[0, 4 * w + 3]
            eq = jnp.where(
                chars == 0, p0,
                jnp.where(chars == 1, p1,
                          jnp.where(chars == 2, p2,
                                    jnp.where(chars == 3, p3, jnp.uint32(0)))))
            eq = eq | (hin < 0).astype(jnp.uint32)
            vp_w = vp_ref[w * _SUB:(w + 1) * _SUB]
            vn_w = vn_ref[w * _SUB:(w + 1) * _SUB]

            xv = eq | vn_w
            a = eq & vp_w
            xh = ((a + vp_w) ^ vp_w) | eq
            ph = vn_w | (~(xh | vp_w) & _FULL)
            mh = vp_w & xh
            hout = jnp.where(
                (ph & _TOP) != 0, 1,
                jnp.where((mh & _TOP) != 0, -1, 0)).astype(jnp.int32)
            ph = (ph << _ONE) | (hin > 0).astype(jnp.uint32)
            mh = (mh << _ONE) | (hin < 0).astype(jnp.uint32)
            vp_n = mh | (~(xv | ph) & _FULL)
            vn_n = ph & xv

            vp_ref[w * _SUB:(w + 1) * _SUB] = jnp.where(active, vp_n, vp_w)
            vn_ref[w * _SUB:(w + 1) * _SUB] = jnp.where(active, vn_n, vn_w)
            hin = hout
            delta = hout                          # bottom word's hout survives

        sc_ref[...] = sc_ref[...] + jnp.where(active, delta, 0)
        return _

    jax.lax.fori_loop(0, _COLS, column, None)

    @pl.when(b == n_blocks - 1)
    def _emit():
        score_ref[0] = sc_ref[...]
        vp_out_ref[0] = vp_ref[...]
        vn_out_ref[0] = vn_ref[...]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("window_words", "max_n", "interpret"))
def myers_banded_pallas(
    q_codes: jnp.ndarray,   # (P, M) uint8/int32, pad = 5
    q_lens: jnp.ndarray,    # (P,)
    t_codes: jnp.ndarray,   # (P, N) uint8/int32, pad = 4
    t_lens: jnp.ndarray,    # (P,)
    window_words: int = 8,
    max_n: int | None = None,
    interpret: bool = False,
):
    """Banded batched Myers on a fused Pallas kernel.  Exact when the
    optimal path stays inside the static ``window_words * 32``-diagonal
    band; -1 for problems whose size difference exceeds the band."""
    P, M = q_codes.shape
    N = t_codes.shape[1]
    cols = max_n if max_n is not None else N
    WB = window_words
    klo, khi, h = _geometry(WB)

    m = q_lens.astype(jnp.int32)
    n = t_lens.astype(jnp.int32)
    diff = n - m
    in_band = (diff - klo >= W_BITS) & (khi - diff >= W_BITS) & (m > 0) & (n > 0)

    n_words = max((M + W_BITS - 1) // W_BITS, WB) + WB + 2
    max_wb = n_words - WB
    n_blocks = max(_round_up(cols, _COLS) // _COLS, 1)
    Pp = _round_up(max(P, 1), _TILE_P)
    n_pt = Pp // _TILE_P

    peq = _pack_peq(q_codes, n_words)             # (P, 4, n_words)

    # pad the problem axis and reshape to the kernel's (SUB, 128) tiles
    def tile(x, fill):
        pad = jnp.full((Pp - P,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0) if Pp > P else x

    n_eff = tile(jnp.where(in_band, n, 0), 0)     # inactive unless in band
    n_tiles = n_eff.reshape(n_pt, _SUB, _LANES)

    # PEq window per block, in kernel layout (n_blocks, WB*4, Pp)
    peq_w = tile(peq, 0).transpose(2, 1, 0)       # (n_words, 4, Pp)
    b_idx = jnp.arange(n_blocks, dtype=jnp.int32)
    wb_b = jnp.clip(b_idx - h, 0, max_wb)

    def fill_block(b, out):
        z = jnp.zeros((), jnp.int32)
        sl = jax.lax.dynamic_slice(peq_w, (wb_b[b], z, z), (WB, 4, Pp))
        b32 = jnp.asarray(b, jnp.int32)
        z = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_update_slice(out, sl[None], (b32, z, z, z))

    peq_blocks = jax.lax.fori_loop(
        0, n_blocks, fill_block,
        jnp.zeros((n_blocks, WB, 4, Pp), jnp.uint32))
    # problem p lives at sublane (p // 128) % 8 of tile p // 1024, lane p % 128
    peq_blocks = peq_blocks.reshape(n_blocks, WB * 4, n_pt * _SUB, _LANES)

    # text columns in kernel layout (n_blocks, 32, n_pt*SUB, 128)
    t32 = tile(t_codes.astype(jnp.int32), 4)      # (Pp, N)
    Nc = n_blocks * _COLS
    t_padded = jnp.full((Pp, Nc), 4, jnp.int32)
    t_padded = jax.lax.dynamic_update_slice(t_padded, t32[:, :Nc], (0, 0))
    t_blocks = t_padded.T.reshape(n_blocks, _COLS, n_pt * _SUB, _LANES)

    score, vp_fin, vn_fin = pl.pallas_call(
        partial(_kernel, WB=WB, h=h, max_wb=max_wb),
        out_shape=(
            jax.ShapeDtypeStruct((n_pt, _SUB, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_pt, WB * _SUB, _LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n_pt, WB * _SUB, _LANES), jnp.uint32),
        ),
        grid=(n_pt, n_blocks),
        in_specs=[
            pl.BlockSpec((1, _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WB * 4, _SUB, _LANES), lambda p, b: (b, 0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _COLS, _SUB, _LANES), lambda p, b: (b, 0, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WB * _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WB * _SUB, _LANES), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((WB * _SUB, _LANES), jnp.uint32),
            pltpu.VMEM((WB * _SUB, _LANES), jnp.uint32),
            pltpu.VMEM((_SUB, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(n_tiles, peq_blocks, t_blocks)

    score = score.reshape(Pp)[:P]
    vp_fin = vp_fin.reshape(n_pt, WB, _SUB, _LANES).transpose(
        0, 2, 3, 1).reshape(Pp, WB)[:P]           # (P, WB) per-word
    vn_fin = vn_fin.reshape(n_pt, WB, _SUB, _LANES).transpose(
        0, 2, 3, 1).reshape(Pp, WB)[:P]

    # closed-form window-advance bookkeeping (+32 per advanced word)
    wb_p = jnp.clip(jnp.maximum(0, n - khi) // W_BITS, 0, max_wb)
    score = score + wb_p * W_BITS

    # walk from the window-bottom row up to pattern row m-1
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, WB, W_BITS), 2)
    w_local = jnp.arange(WB, dtype=jnp.int32)[None, :, None]
    rows = (wb_p[:, None, None] + w_local) * W_BITS + lane.astype(jnp.int32)
    in_range = rows > (m[:, None, None] - 1)
    vp_bits = ((vp_fin[:, :, None] >> lane) & _ONE) != 0
    vn_bits = ((vn_fin[:, :, None] >> lane) & _ONE) != 0
    adj = jnp.sum(
        jnp.where(in_range & vp_bits, -1, 0) + jnp.where(in_range & vn_bits, 1, 0),
        axis=(1, 2)).astype(jnp.int32)
    score = score + adj

    bottom_row = (wb_p + WB) * W_BITS - 1
    ok = in_band & (bottom_row >= m - 1) & (m - 1 >= wb_p * W_BITS - 1)
    return jnp.where(ok, score, -1).astype(jnp.int32)
