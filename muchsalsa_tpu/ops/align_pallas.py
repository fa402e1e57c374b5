"""Pallas TPU kernel for the banded edit-distance wavefront.

Same math as ``ops.align.banded_edit_distance`` (row sweep + min-plus
prefix scan), hand-tiled for the TPU:

- problems are packed 8 per sublane tile; the per-cell substitution
  costs are precomputed by XLA as a dense (rows, P, B) band (1 byte per
  DP cell — the minimum traffic for the sweep) and streamed through
  VMEM as (1, 8, B) blocks by the Pallas pipeline;
- the grid is (P/8, rows) and TPU grids execute sequentially with the
  last axis innermost, so the wavefront register file (the (8, B) band
  vector) lives in VMEM scratch that persists across row steps;
- the in-row left-neighbor chain is a min-plus prefix scan done as
  log2(B) lane-rolls on the VPU — no unaligned dynamic slicing
  anywhere, which the Mosaic lowering cannot prove safe.

Equivalence against the XLA version (and the full-DP oracle) is tested
in ``tests/test_align_pallas.py`` (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muchsalsa_tpu.ops.align import INF

# problems per sublane tile: amortizes lane-roll issue cost (measured
# 3.6 / 12.2 / 17.5 G cells/s at SUB = 8 / 32 / 64 on a stripped kernel)
# — but SUB=64 makes the remote Mosaic compile pathologically slow
# (>25 min), so 32 is the reliable production setting
_SUB = 32


def _prefix_min_lanes(x: jnp.ndarray, B: int) -> jnp.ndarray:
    """Inclusive prefix-min along the lane axis via log2(B) rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < B:
        rolled = pltpu.roll(x, s, axis=1)
        rolled = jnp.where(lane >= s, rolled, INF)
        x = jnp.minimum(x, rolled)
        s *= 2
    return x


def _kernel(lens_ref, cost_ref, out_ref, r_ref, *, B: int, rows: int, chunk: int):
    c = pl.program_id(1)  # row chunk
    n_chunks = pl.num_programs(1)

    m = lens_ref[:, 0:1]
    n = lens_ref[:, 1:2]

    diff = n - m
    slack = (B - 1 - jnp.abs(diff)) // 2
    klo = jnp.minimum(0, diff) - slack

    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, B), 1)
    k = klo + lane

    @pl.when(c == 0)
    def _init():
        r_ref[...] = jnp.where((k >= 0) & (k <= n), k, INF).astype(jnp.int32)

    def row(r, _):
        i = c * chunk + r + 1  # DP row, 1-based
        R = r_ref[...]
        j = i + k
        cost = cost_ref[r].astype(jnp.int32)

        diag = R + cost
        # R[k+1] at lane k: roll by B-1 (wraps), mask the last lane
        up = pltpu.roll(R, B - 1, axis=1)
        up = jnp.where(lane == B - 1, INF, up) + 1
        cand = jnp.minimum(diag, up)
        cand = jnp.where(j == 0, i, cand)
        cand = jnp.where((j >= 0) & (j <= n), cand, INF)

        x = _prefix_min_lanes(cand - lane, B)
        Rn = jnp.minimum(x + lane, INF)
        Rn = jnp.where((j >= 0) & (j <= n), Rn, INF).astype(jnp.int32)
        r_ref[...] = jnp.where(i <= m, Rn, R)
        return _

    jax.lax.fori_loop(0, chunk, row, None)

    @pl.when(c == n_chunks - 1)
    def _finish():
        Rf = r_ref[...]
        idx = jnp.clip(diff - klo, 0, B - 1)
        val = jnp.min(jnp.where(lane == idx, Rf, INF), axis=1, keepdims=True)
        ok = (jnp.abs(diff) < B) & (m > 0) & (n > 0) & (m <= rows)
        val = jnp.where(ok, val, -1)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
        out_ref[...] = jnp.where(out_lane == 0, val, 0).astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("band", "max_m", "interpret"))
def banded_edit_distance_pallas(
    q_codes: jnp.ndarray,   # (P, M) uint8/int32, pad = 5
    q_lens: jnp.ndarray,    # (P,)
    t_codes: jnp.ndarray,   # (P, N) uint8/int32, pad = 4
    t_lens: jnp.ndarray,    # (P,)
    band: int = 128,
    max_m: int | None = None,
    interpret: bool = False,
):
    P, M = q_codes.shape
    N = t_codes.shape[1]
    B = band
    assert B % 128 == 0, "band must be a multiple of the TPU lane count"
    rows = max_m if max_m is not None else M
    chunk = min(256, rows)
    rows = _round_up(rows, chunk)

    Pp = _round_up(max(P, 1), _SUB)

    q32 = jnp.full((Pp, rows), 5, dtype=jnp.int32)
    q32 = q32.at[:P, : min(M, rows)].set(q_codes[:, :rows].astype(jnp.int32))

    m_arr = jnp.zeros(Pp, jnp.int32).at[:P].set(q_lens.astype(jnp.int32))
    n_arr = jnp.zeros(Pp, jnp.int32).at[:P].set(t_lens.astype(jnp.int32))

    # band shift: window for row i covers t columns j-1 = i-1+klo .. +B-1
    diff = n_arr - m_arr
    slack = (B - 1 - jnp.abs(diff)) // 2
    klo = jnp.minimum(0, diff) - slack
    klo_eff = jnp.clip(klo, -B, N)

    t_full = jnp.concatenate(
        [
            jnp.full((Pp, B), 4, dtype=jnp.int32),
            jnp.full((Pp, N), 4, dtype=jnp.int32).at[:P, :].set(t_codes.astype(jnp.int32)),
            jnp.full((Pp, B + rows), 4, dtype=jnp.int32),
        ],
        axis=1,
    )
    # one *small* per-problem-shift gather: t_shift[p, y] = t_full[p, y + klo_p + B]
    shift_idx = jnp.arange(rows + B)[None, :] + (klo_eff + B)[:, None]
    t_shift = jnp.take_along_axis(t_full, shift_idx, axis=1)      # (Pp, rows+B)

    # cost[i, p, x] = (q[p, i] != t_shift[p, i + x]) built directly in the
    # kernel's (rows, P, B) layout, one band-offset slice at a time with
    # in-place updates — a (P, rows, B) take_along_axis gather is
    # catastrophically slow on TPU and a 256-way stack blows up HBM
    q_t = q32.T                                                    # (rows, Pp)
    t_t = t_shift.T                                                # (rows+B, Pp)

    def fill(x, cost):
        sl = jax.lax.dynamic_slice_in_dim(t_t, x, rows, axis=0)
        col = (q_t != sl).astype(jnp.int8)[:, :, None]
        return jax.lax.dynamic_update_slice(cost, col, (0, 0, x))

    cost = jax.lax.fori_loop(
        0, B, fill, jnp.zeros((rows, Pp, B), jnp.int8)
    )                                                              # (rows, Pp, B)

    lens_v = jnp.zeros((Pp, 128), jnp.int32)
    lens_v = lens_v.at[:, 0].set(m_arr).at[:, 1].set(n_arr)

    out = pl.pallas_call(
        partial(_kernel, B=B, rows=rows, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((Pp, 128), jnp.int32),
        grid=(Pp // _SUB, rows // chunk),
        in_specs=[
            pl.BlockSpec((_SUB, 128), lambda p, c: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _SUB, B), lambda p, c: (c, p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SUB, 128), lambda p, c: (p, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_SUB, B), jnp.int32)],
        interpret=interpret,
    )(lens_v, cost)

    return out[:P, 0]
