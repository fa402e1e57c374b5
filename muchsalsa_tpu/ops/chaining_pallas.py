"""Pallas TPU kernel for the anchor-chaining forward DP scan.

``chain_dp_batch`` builds the (B, K, K) compatibility matrix with
vectorised XLA ops (that part saturates the VPU already) but runs the
forward DP as a ``lax.scan`` whose per-step work — one masked (K,) max
per problem — is far too small to fill the machine.  This kernel fuses
the whole scan: 128 problems per lane tile, the (K, 128) score matrix
lives in VMEM scratch, and the K steps unroll statically (K is a
bucket size, 8..128).

Backpointers use the min-index-among-maxima formulation (identical to
``jnp.argmax``'s first-occurrence rule).  Bit-identical to the XLA scan
per dtype — equivalence tested in ``tests/test_chaining_jax.py``
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LANES = 128


def _kernel(compat_ref, init_ref, scores_ref, bps_ref, sc_ref, *, K: int):
    sc_ref[...] = init_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (K, _LANES), 0)

    for l in range(K):
        scores = sc_ref[...]
        mask = (compat_ref[0, l] != 0) & (row < l)
        cand = jnp.where(mask, scores, _NEG)
        best = jnp.max(cand, axis=0, keepdims=True)           # (1, 128)
        bp = jnp.min(jnp.where(cand == best, row, K), axis=0, keepdims=True)
        ok = best > _NEG
        sc_ref[l:l + 1] = jnp.where(
            ok, init_ref[0, l:l + 1] + best, scores[l:l + 1])
        bps_ref[0, l:l + 1] = jnp.where(ok, bp, -1)

    scores_ref[0] = sc_ref[...]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("interpret",))
def chain_scan_pallas(compat: jnp.ndarray, init: jnp.ndarray,
                      interpret: bool = False):
    """Forward chaining DP over precomputed compatibility.

    ``compat``: (B, K, K) bool/uint8 where [b, l, k] says anchor k can
    precede anchor l.  ``init``: (B, K) initial scores (padding rows
    hold ``_NEG``).  Returns (scores (B, K), backptrs (B, K) int32).
    """
    B, K = init.shape
    dtype = init.dtype
    Bp = _round_up(max(B, 1), _LANES)
    n_bt = Bp // _LANES

    compat_t = jnp.zeros((K, K, Bp), jnp.uint8)
    compat_t = compat_t.at[:, :, :B].set(
        jnp.transpose(compat.astype(jnp.uint8), (1, 2, 0)))
    init_t = jnp.full((K, Bp), _NEG, dtype)
    init_t = init_t.at[:, :B].set(init.T)
    compat_t = compat_t.reshape(K, K, n_bt, _LANES).transpose(2, 0, 1, 3)
    init_t = init_t.reshape(K, n_bt, _LANES).transpose(1, 0, 2)

    scores, bps = pl.pallas_call(
        partial(_kernel, K=K),
        out_shape=(
            jax.ShapeDtypeStruct((n_bt, K, _LANES), dtype),
            jax.ShapeDtypeStruct((n_bt, K, _LANES), jnp.int32),
        ),
        grid=(n_bt,),
        in_specs=[
            pl.BlockSpec((1, K, K, _LANES), lambda p: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, _LANES), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, _LANES), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, _LANES), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((K, _LANES), dtype)],
        interpret=interpret,
    )(compat_t, init_t)

    scores = scores.transpose(1, 0, 2).reshape(K, Bp).T[:B]
    bps = bps.transpose(1, 0, 2).reshape(K, Bp).T[:B]
    return scores, bps
