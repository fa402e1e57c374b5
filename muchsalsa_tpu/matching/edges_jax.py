"""Scaffold all-pairs intersection on the device (XLA / shard_map).

SPMD twin of :func:`matching.edges.build_edges` — the SURVEY.md §2.5
mapping of the reference's Job-per-scaffold fan-out
(``MatchMap.cpp:161-224``): scaffolds (unitig groups) pad into fixed
(G, K) tables, shard over the mesh's data axis with one (K, K)
upper-triangle intersection per scaffold, and the surviving pair fields
compact back on the host into the identical ``EdgeMatches`` table
(tests assert equality with the host path field by field).

Scaffolds larger than the biggest bucket run through the host pair
path — same formulas, same output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from muchsalsa_tpu.matching.edges import (
    _finish_edges, _empty_edges, _pair_indices, _scaffold_groups)
from muchsalsa_tpu.matching.store import EdgeMatches, MatchStore


@partial(jax.jit, static_argnames=("th_overlap",))
def scaffold_pairs_device(ist, ien, valid, th_overlap: int):
    """(G, K) illumina ranges -> (G, K, K) pair overlap fields.

    Entry [g, j, i] (i = inner/earlier line, j = outer) holds the
    intersection of rows i and j of scaffold g; ``keep`` applies the
    strict ``end - start > th_overlap`` rule (MatchMap.cpp:192).
    """
    a_s, a_e = ist[:, None, :], ien[:, None, :]          # inner (i) axis
    b_s, b_e = ist[:, :, None], ien[:, :, None]          # outer (j) axis
    ov_s = jnp.maximum(a_s, b_s)
    ov_e = jnp.minimum(a_e, b_e)
    K = ist.shape[1]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (K, K), 0))  # i < j
    pair_valid = valid[:, None, :] & valid[:, :, None] & tri[None]
    keep = pair_valid & (ov_s <= ov_e) & ((ov_e - ov_s) > th_overlap)
    return ov_s, ov_e, keep


def build_edges_device(
    store: MatchStore,
    th_overlap: int = 100,
    mesh=None,
    max_scaffold: int = 256,
) -> EdgeMatches:
    """``build_edges`` with the all-pairs intersection on the device.

    With ``mesh`` given, scaffolds shard over its first axis
    (replicating nothing — each device owns a slice of the padded
    scaffold table).  Output is identical to the host path.
    """
    n = len(store)
    if n == 0:
        return _empty_edges()

    order, group_sizes = _scaffold_groups(store)
    group_starts = np.concatenate(([0], np.cumsum(group_sizes)))[:-1]
    lim = int(group_sizes.max()) + 1  # shared radix for the pair-order key

    small = group_sizes <= max_scaffold
    dev_groups = np.nonzero(small & (group_sizes >= 2))[0]
    host_groups = np.nonzero(~small)[0]

    all_ri: list[np.ndarray] = []
    all_ro: list[np.ndarray] = []
    all_s: list[np.ndarray] = []
    all_e: list[np.ndarray] = []
    pair_rank: list[np.ndarray] = []  # global order key for re-merge

    if len(dev_groups):
        K = 1 << int(max(int(group_sizes[dev_groups].max()) - 1, 0)).bit_length()
        G = len(dev_groups)
        n_dev = 1
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
        Gp = -(-G // n_dev) * n_dev  # pad scaffold count to mesh multiple

        ist = np.zeros((Gp, K), dtype=np.int32)
        ien = np.full((Gp, K), -1, dtype=np.int32)
        valid = np.zeros((Gp, K), dtype=bool)
        for slot, g in enumerate(dev_groups):
            sz = int(group_sizes[g])
            rows = order[group_starts[g] : group_starts[g] + sz]
            ist[slot, :sz] = store.illu_start[rows]
            ien[slot, :sz] = store.illu_end[rows]
            valid[slot, :sz] = True

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            @partial(
                shard_map, mesh=mesh,
                in_specs=(P(mesh.axis_names[0]),) * 3,
                out_specs=(P(mesh.axis_names[0]),) * 3,
            )
            def step(a, b, v):
                return scaffold_pairs_device(a, b, v, th_overlap)

            ov_s, ov_e, keep = jax.jit(step)(
                jnp.asarray(ist), jnp.asarray(ien), jnp.asarray(valid))
        else:
            ov_s, ov_e, keep = scaffold_pairs_device(
                jnp.asarray(ist), jnp.asarray(ien), jnp.asarray(valid),
                th_overlap)

        keep = np.asarray(keep)
        ov_s = np.asarray(ov_s)
        ov_e = np.asarray(ov_e)
        slot_idx, j_idx, i_idx = np.nonzero(keep)  # row-major: (g, j, i) asc
        g_idx = dev_groups[slot_idx]
        base = group_starts[g_idx]
        all_ri.append(order[base + i_idx])
        all_ro.append(order[base + j_idx])
        all_s.append(ov_s[slot_idx, j_idx, i_idx])
        all_e.append(ov_e[slot_idx, j_idx, i_idx])
        # global pair order = (group, outer, inner)
        pair_rank.append(
            (g_idx.astype(np.int64) * lim + j_idx) * lim + i_idx)

    if len(host_groups):
        sizes_h = group_sizes[host_groups]
        inner, outer = _pair_indices(sizes_h)
        starts_h = np.concatenate(([0], np.cumsum(sizes_h)))[:-1]
        # map local (within host subset) positions back to global rows
        pos_of = np.repeat(group_starts[host_groups] - starts_h,
                           sizes_h * (sizes_h - 1) // 2)
        ri = order[pos_of + inner]
        ro = order[pos_of + outer]
        ov_start = np.maximum(store.illu_start[ro], store.illu_start[ri])
        ov_end = np.minimum(store.illu_end[ro], store.illu_end[ri])
        kp = (ov_start <= ov_end) & ((ov_end - ov_start) > th_overlap)
        n_pairs_h = sizes_h * (sizes_h - 1) // 2
        grp_of_pair = np.repeat(host_groups, n_pairs_h)
        local_base = np.repeat(starts_h, n_pairs_h)
        rank = ((grp_of_pair.astype(np.int64) * lim + (outer - local_base))
                * lim + (inner - local_base))
        all_ri.append(ri[kp])
        all_ro.append(ro[kp])
        all_s.append(ov_start[kp])
        all_e.append(ov_end[kp])
        pair_rank.append(rank[kp])

    if not all_ri:
        return _empty_edges()

    ri = np.concatenate(all_ri)
    ro = np.concatenate(all_ro)
    ov_start = np.concatenate(all_s)
    ov_end = np.concatenate(all_e)
    rank = np.concatenate(pair_rank)
    # restore the reference's global (scaffold, outer, inner) pair order
    merge = np.argsort(rank, kind="stable")
    return _finish_edges(
        store, ri[merge], ro[merge], ov_start[merge], ov_end[merge])
