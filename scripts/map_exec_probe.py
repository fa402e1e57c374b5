"""Exec-only probe of the production device-mapping path (VERDICT r4 #1).

Round 4 decomposed the warm resident pass into exec (1.16 s, 6,601
reads/s) vs tunnel d2h; the kernel alone does ~8-13 k reads/s — so
~2x of the throughput evaporates in per-batch overheads.  This probe
reproduces the E. coli workload (same seed as tpu_map_run.py), keeps
every batch device-resident, and times JUST the dispatch chain the
production ``map_all_with_device`` runs (six jits + windowed concat),
excluding d2h, at a configurable batch size.

Usage: python scripts/map_exec_probe.py [R=256] [max_pos=2048] [mph=4]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    max_pos = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    max_per_hit = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    max_hits = 64

    import jax
    import jax.numpy as jnp

    from muchsalsa_tpu import native
    from muchsalsa_tpu.config import MapperConfig
    from muchsalsa_tpu.io.fasta import SequenceStore
    from muchsalsa_tpu.ops.mapping_jax import (
        anchors_to_hits_device_dense, build_device_tables,
        compact_candidates_device_v2, expand_anchors_device_v2,
        probe_candidates_device_v2, select_compact_device_v2,
        sketch_device_packed)
    from muchsalsa_tpu.pipeline.mapper import MinimizerIndex
    from muchsalsa_tpu.testing.simulate import add_noise, simulate
    from muchsalsa_tpu.utils import aot_cache
    from muchsalsa_tpu.utils.aot_cache import cached_call

    print(f"[exec_probe] devices: {jax.devices()} R={R} "
          f"max_pos={max_pos} mph={max_per_hit}", flush=True)

    rng = np.random.default_rng(20260819)
    sim = simulate(rng, genome_length=int(4.6e6), coverage=15.0,
                   read_length=9_000, unitig_length=1_000, unitig_gap=300)
    unitigs = SequenceStore()
    for name, seq in sim.unitig_records():
        unitigs.add(name, seq)
    reads = SequenceStore()
    for name, seq in sim.read_records():
        reads.add(name, add_noise(rng, seq, 0.05))
    cfg = MapperConfig()
    index = MinimizerIndex.build(unitigs, cfg)
    items = list(reads.items())
    n_reads = len(items)
    print(f"[exec_probe] {n_reads} reads, {len(index.hashes)} hashes",
          flush=True)

    tables, hash_takes = build_device_tables(
        index.hashes, index.offsets, index.entry_unitig, index.entry_pos,
        index.entry_strand)

    # length buckets exactly as map_all_with_device
    from muchsalsa_tpu.pipeline.mapper import device_bucket_len as bucket_len

    buckets: dict[int, list] = {}
    for rid, seq in items:
        buckets.setdefault(bucket_len(len(seq)), []).append((rid, seq))

    batches = []  # (L, packed, nmask, lens) device-resident
    for L, members in sorted(buckets.items()):
        for s in range(0, len(members), R):
            chunk = members[s : s + R]
            packed, nmask, lens = native.pack_reads_2bit(
                [seq for _rid, seq in chunk], L, n_rows=R)
            batches.append((L, jnp.asarray(packed), jnp.asarray(nmask),
                            jnp.asarray(lens)))
    for _L, p, m, ln in batches:
        jax.block_until_ready((p, m, ln))
    print(f"[exec_probe] {len(batches)} resident batches "
          f"(buckets {sorted(buckets)})", flush=True)

    from muchsalsa_tpu.pipeline.mapper import device_bucket_budgets

    hit_budget = min(16 * R, R * max_hits)

    def chain(L, packed, nmask, lens):
        sel_L, pos_L, trim_L = device_bucket_budgets(
            L, cfg.k, max_pos, max_per_hit)
        selected, h, strand = cached_call(
            sketch_device_packed, (packed, nmask, lens),
            dict(k=cfg.k, w=cfg.w))
        skey, h_s, n_sel = cached_call(
            select_compact_device_v2, (selected, h, strand),
            dict(max_sel=sel_L))
        rpv, cand = cached_call(
            probe_candidates_device_v2, (skey, h_s, tables.rp), {})
        sel = cached_call(
            compact_candidates_device_v2, (skey, h_s, rpv, cand, n_sel),
            dict(max_pos=pos_L))
        anchors = cached_call(
            expand_anchors_device_v2, (*sel, tables.jrows, tables.erows),
            dict(max_per_hit=max_per_hit, hash_takes=hash_takes))
        return cached_call(
            anchors_to_hits_device_dense, tuple(anchors),
            dict(k=cfg.k, bandwidth=cfg.bandwidth,
                 min_anchor_count=cfg.min_anchor_count,
                 min_chain_score=cfg.min_chain_score,
                 max_hits=max_hits, trim=trim_L, budget=hit_budget))

    def sync(x):
        return np.asarray(x[0])  # scalar pull = true tunnel sync

    aot_cache.reset_cache_stats()
    t0 = time.perf_counter()
    out = [chain(_L, p, m, ln) for _L, p, m, ln in batches]
    sync(out[-1])
    first_s = time.perf_counter() - t0
    print(f"[exec_probe] first pass (compiles/loads): {first_s:.1f}s "
          f"aot={aot_cache.cache_stats()}", flush=True)

    W = max(1, int(os.environ.get("MS_TPU_PULL_WINDOW", "8")))
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        outs = [chain(_L, p, m, ln) for _L, p, m, ln in batches]
        # production also concats W-batch windows device-side
        cats = [jnp.concatenate([o for o in outs[i : i + W]])
                for i in range(0, len(outs), W)]
        sync(cats[-1])
        best = min(best, time.perf_counter() - t0)
    print(f"[exec_probe] exec-only (chain + window concat, one sync): "
          f"{best:.3f}s = {n_reads/best:.0f} reads/s", flush=True)

    # dispatch-only: how much of it is host-side Python + tunnel messaging
    t0 = time.perf_counter()
    outs = [chain(_L, p, m, ln) for _L, p, m, ln in batches]
    dispatch_s = time.perf_counter() - t0
    sync(outs[-1])
    total_s = time.perf_counter() - t0
    print(f"[exec_probe] dispatch wall {dispatch_s:.3f}s, device drain "
          f"{total_s - dispatch_s:.3f}s", flush=True)


if __name__ == "__main__":
    main()
