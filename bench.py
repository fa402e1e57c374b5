#!/usr/bin/env python3
"""Benchmark: flagship device kernels on the current accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: exact edit-distance throughput of the batched Myers
bit-parallel kernel in GCUPS (billions of DP cell updates per second —
the figure named in BASELINE.json), versus the identical computation on
this host's CPU (the stand-in for the reference's CPU path — the C++
reference cannot be built here: its cmake FetchContent needs network).

Secondary numbers on stderr: the banded wavefront kernels (Pallas +
XLA) and the anchor-chaining DP.

Timing methodology: the device sits behind an async tunnel where
``block_until_ready`` returns immediately and host transfers are slow,
so each measurement chains ITERS kernel invocations *inside one jit*
with a value dependency between iterations, synchronises on a single
scalar transfer, and subtracts the measured round-trip latency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent compilation cache: the remote Mosaic compile of the Pallas
# kernel can take many minutes; cache it across processes/runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

CHAIN_B, CHAIN_K = 2048, 64
ALIGN_P, ALIGN_L, ALIGN_BAND = 512, 2000, 256
ITERS = 10
WIGGLE = 300


def _sync_latency() -> float:
    """Round-trip cost of a scalar fetch through the tunnel."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 128))
    _ = np.asarray(f(x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed_loop(loop_fn, args, latency: float, iters: int = ITERS, reps: int = 2) -> float:
    """Seconds per iteration of ``loop_fn`` (jitted, runs ``iters``
    chained iterations internally, returns a scalar).

    The latency subtraction is clamped to half the measured wall: the
    tunnel round-trip is load-sensitive, and subtracting a stale
    inflated latency from a fast loop otherwise fabricates absurd
    figures (a concurrent-load run once reported 8.7x the real banded
    throughput this way)."""
    import jax

    f = jax.jit(loop_fn)
    _ = np.asarray(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - min(latency, 0.5 * best), 1e-9) / iters


def _align_problems(n_problems: int = ALIGN_P):
    from muchsalsa_tpu.ops.align import pack_problems
    from muchsalsa_tpu.testing.simulate import random_genome

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(n_problems):
        q = random_genome(rng, ALIGN_L)
        t = np.frombuffer(q, dtype=np.uint8).copy()
        flip = rng.random(len(t)) < 0.1
        t[flip] = bases[rng.integers(0, 4, int(flip.sum()))]
        pairs.append((q, t.tobytes()))
    return pack_problems(pairs)


def _bench_myers(latency: float, n_problems: int = ALIGN_P, iters: int = ITERS) -> float:
    """Exact edit-distance GCUPS (full m*n matrix) on the active backend.
    Uses the fused Pallas kernel on TPU and the XLA kernel elsewhere —
    both bit-identical (tests/test_myers_pallas.py)."""
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform == "tpu":
        from muchsalsa_tpu.ops.myers_full_pallas import (
            myers_edit_distance_pallas as myers_edit_distance,
        )
    else:
        from muchsalsa_tpu.ops.myers_jax import myers_edit_distance

    q_codes, q_lens, t_codes, t_lens = _align_problems(n_problems)

    def loop(q_codes, q_lens, t_codes, t_lens):
        def body(i, acc):
            bump = jnp.where(acc > 1e30, 1, 0).astype(q_lens.dtype)
            out = myers_edit_distance(q_codes, q_lens + bump, t_codes, t_lens)
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    dt = _timed_loop(loop, (q_codes, q_lens, t_codes, t_lens), latency, iters)
    cells = n_problems * ALIGN_L * t_codes.shape[1]
    return cells / dt


def _bench_align(use_pallas: bool, latency: float) -> float:
    """Banded-DP band-cells/s on the active backend."""
    import jax
    import jax.numpy as jnp

    from muchsalsa_tpu.ops.align import banded_edit_distance
    from muchsalsa_tpu.ops.align_pallas import banded_edit_distance_pallas

    q_codes, q_lens, t_codes, t_lens = _align_problems()
    fn = banded_edit_distance_pallas if use_pallas else banded_edit_distance

    def loop(q_codes, q_lens, t_codes, t_lens):
        def body(i, acc):
            # value-dependent perturbation the compiler cannot fold away
            bump = jnp.where(acc > 1e30, 1, 0).astype(q_lens.dtype)
            out = fn(q_codes, q_lens + bump, t_codes, t_lens, band=ALIGN_BAND)
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    dt = _timed_loop(loop, (q_codes, q_lens, t_codes, t_lens), latency)
    cells = ALIGN_P * q_codes.shape[1] * ALIGN_BAND
    return cells / dt


def _bench_myers_banded_pallas(latency: float) -> tuple[float, float]:
    """Fused Pallas banded Myers: (alignments/s, band-cells/s)."""
    import jax
    import jax.numpy as jnp

    from muchsalsa_tpu.ops.myers_pallas import myers_banded_pallas

    q_codes, q_lens, t_codes, t_lens = _align_problems()
    ww = ALIGN_BAND // 32

    def loop(q_codes, q_lens, t_codes, t_lens):
        def body(i, acc):
            bump = jnp.where(acc > 1e30, 1, 0).astype(q_lens.dtype)
            out = myers_banded_pallas(
                q_codes, q_lens + bump, t_codes, t_lens, window_words=ww
            )
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    dt = _timed_loop(loop, (q_codes, q_lens, t_codes, t_lens), latency)
    return ALIGN_P / dt, ALIGN_P * ALIGN_L * ALIGN_BAND / dt


SEED_R, SEED_L = 512, 10_240


def _bench_seeding(latency: float) -> float:
    """Device mapping-lookup stage: minimizer sketch + replicated-index
    join; returns reads/s (10kb nanopore-length reads)."""
    import jax
    import jax.numpy as jnp

    from muchsalsa_tpu.ops.minimizer_jax import anchor_counts_bitmap, build_hash_bitmap

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, (SEED_R, SEED_L)).astype(np.uint8))
    lens = jnp.asarray(np.full(SEED_R, SEED_L, dtype=np.int32))
    bitmap = build_hash_bitmap(rng.integers(0, 1 << 32, 1 << 20, dtype=np.uint32))

    def loop(codes, lens, bitmap):
        def body(i, acc):
            bump = jnp.where(acc > 1e30, 1, 0).astype(lens.dtype)
            counts = anchor_counts_bitmap(codes, lens + bump, bitmap)
            return acc + jnp.sum(counts).astype(jnp.float32) * 1e-20

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    dt = _timed_loop(loop, (codes, lens, bitmap), latency)
    return SEED_R / dt


def _bench_full_mapping(latency: float) -> float:
    """Full device mapping (sketch -> join -> chain -> Mapping tables)
    reads/s on 10 kb reads vs a 1M-entry index, via the PRODUCTION
    six-jit split path (sketch | selcompact | probe | compact | expand
    | tail — exactly what ``map_all_with_device`` dispatches), data
    device-resident.  Warm executables; ITERS async dispatches, one
    sync (the tunnel makes per-batch syncs meaningless)."""
    import jax
    import jax.numpy as jnp

    from muchsalsa_tpu.ops.mapping_jax import (
        anchors_to_hits_device_packed, build_device_tables,
        compact_candidates_device_v2, expand_anchors_device_v2,
        pack_codes, probe_candidates_device_v2, select_compact_device_v2,
        sketch_device_packed)

    rng = np.random.default_rng(0)
    R, L = 256, 10_240
    codes_np = rng.integers(0, 4, (R, L)).astype(np.uint8)
    lens = jnp.asarray(np.full(R, L, dtype=np.int32))
    E = 1 << 20
    hashes = np.unique(np.sort(rng.integers(0, 1 << 32, E, dtype=np.uint32)))
    H = len(hashes)
    tables, hash_takes = build_device_tables(
        hashes, np.arange(H + 1, dtype=np.int64),
        rng.integers(0, 5000, H).astype(np.int32),
        rng.integers(0, 1000, H).astype(np.int32),
        rng.random(H) < 0.5,
    )
    packed_np, nmask_np = pack_codes(codes_np)
    packed = jnp.asarray(packed_np)
    nmask = jnp.asarray(nmask_np)

    # the production per-bucket budgets (round 5: width-proportional)
    from muchsalsa_tpu.pipeline.mapper import device_bucket_budgets

    max_sel, max_pos, trim = device_bucket_budgets(L, 15, 2048, 4)

    def chain(packed, nmask, lens):
        selected, h, strand = sketch_device_packed(packed, nmask, lens)
        skey, h_s, n_sel = select_compact_device_v2(
            selected, h, strand, max_sel=max_sel)
        rpv, cand = probe_candidates_device_v2(skey, h_s, tables.rp)
        sel = compact_candidates_device_v2(skey, h_s, rpv, cand, n_sel,
                                           max_pos=max_pos)
        anchors = expand_anchors_device_v2(
            *sel, tables.jrows, tables.erows, max_per_hit=4,
            hash_takes=hash_takes)
        return anchors_to_hits_device_packed(*anchors, trim=trim,
                                             per_hit_cap=4)

    out = chain(packed, nmask, lens)  # compile / warm every stage
    _ = np.asarray(out[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [chain(packed, nmask, lens) for _ in range(ITERS)]
        _ = np.asarray(outs[-1][0, 0])
        best = min(best, (time.perf_counter() - t0 - latency) / ITERS)
    return R / best


def _device_parity_check() -> str:
    """Tiny on-device regression run every bench round: the device
    mapping (v2 join) must equal the host mapper on 64 simulated reads,
    and the f32 chaining DP must pick the same chains as the f64
    oracle.  Returns 'ok' or a failure description (also printed)."""
    import jax

    try:
        import numpy as _np

        from muchsalsa_tpu.config import MapperConfig
        from muchsalsa_tpu.io.fasta import SequenceStore
        from muchsalsa_tpu.pipeline.mapper import (
            MinimizerIndex, map_all, map_all_with_device)
        from muchsalsa_tpu.testing.simulate import add_noise, simulate

        from muchsalsa_tpu.pipeline.mapper import map_all_with_device, map_read

        rng = _np.random.default_rng(20260819)
        sim = simulate(rng, genome_length=60_000, coverage=5.0,
                       read_length=2_000)
        unitigs = SequenceStore()
        for name, seq in sim.unitig_records():
            unitigs.add(name, seq)
        reads = SequenceStore()
        for i, (name, seq) in enumerate(sim.read_records()):
            if i >= 64:
                break
            reads.add(name, add_noise(rng, seq, 0.05))
        cfg = MapperConfig()
        index = MinimizerIndex.build(unitigs, cfg)
        # small static budgets: wide (max_pos*A) anchor tables compile
        # pathologically slowly through the remote tunnel (BASELINE.md)
        dev = map_all_with_device(index, reads, cfg,
                                  max_pos=1024, max_per_hit=4)
        n_dev_reads = 0
        for rid, maps in dev:
            host = map_read(index, reads.sequence(rid), cfg)
            if maps != host:
                return f"mapping device/host diverged on read {rid}"
            n_dev_reads += 1
        if n_dev_reads == 0:
            return "mapping parity check had no reads"

        # chaining: the on-device (f32 on TPU) batched DP vs the exact
        # host f64 oracle, end to end through the graph phase
        from muchsalsa_tpu.assemble.driver import (
            build_graph, chaining_phase)
        from muchsalsa_tpu.io.paf import read_paf
        from muchsalsa_tpu.io.registry import Registry
        from muchsalsa_tpu.matching.edges import build_edges
        from muchsalsa_tpu.matching.store import MatchStore
        from muchsalsa_tpu.ops.chaining_jax import chaining_phase_device
        from muchsalsa_tpu.testing.simulate import write_simulation
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            paths = write_simulation(sim, td)
            records = read_paf(paths["paf"], registry_nanopore=Registry(),
                               registry_illumina=Registry())
        store = MatchStore.from_paf(records)
        em = build_edges(store)

        def run(phase):
            graph = build_graph(store, em)
            phase(graph, store, em, WIGGLE)
            return {
                (e.v, e.w): (e.shadow, tuple(e.orders)) for e in graph.edges()
            }

        if run(chaining_phase_device) != run(chaining_phase):
            return "chaining device (f32) diverged from host f64 oracle"
        return "ok"
    except Exception as exc:  # pragma: no cover
        return f"parity check crashed: {exc!r}"


def _bench_chain_dp(latency: float) -> float:
    """Anchor-pairs/s for the chaining DP on the active backend (the
    Pallas fused scan on TPU, XLA scan elsewhere; identical results)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from muchsalsa_tpu.ops.chaining_jax import chain_dp_batch, chain_dp_batch_pallas

    on_tpu = jax.devices()[0].platform == "tpu"
    fn = chain_dp_batch_pallas if on_tpu else chain_dp_batch
    iters = 200 if on_tpu else ITERS  # fused scan needs more reps vs latency

    dtype = np.float64 if jax.config.read("jax_enable_x64") else np.float32
    batch = _example_batch(CHAIN_B, CHAIN_K, dtype)

    def loop(batch):
        def body(i, acc):
            b2 = dict(batch)
            b2["score"] = batch["score"] + acc.astype(batch["score"].dtype)
            scores, bps = fn(b2, WIGGLE)
            return acc + jnp.max(scores).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    dt = _timed_loop(loop, (batch,), latency, iters=iters)
    return CHAIN_B * CHAIN_K * CHAIN_K / dt


def main() -> None:
    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        latency = _sync_latency()
        # smaller workload: full-size Myers on this CPU takes ~30s/iter
        print(_bench_myers(latency, n_problems=32, iters=2))
        return

    if "--pallas-probe" in sys.argv:
        latency = _sync_latency()
        print(_bench_align(use_pallas=True, latency=latency))
        return

    import jax

    backend = jax.devices()[0].platform
    on_tpu = backend == "tpu"
    latency = _sync_latency()
    print(f"[bench] sync latency: {latency*1e3:.1f} ms", file=sys.stderr)

    myers_cells_per_s = _bench_myers(latency)
    print(
        f"[bench] Myers exact DP on {backend}: {myers_cells_per_s/1e9:.1f} GCUPS",
        file=sys.stderr,
    )

    if on_tpu:
        aligns_per_s, band_cells_per_s = _bench_myers_banded_pallas(latency)
        print(
            f"[bench] banded Myers (pallas) on {backend}: "
            f"{aligns_per_s/1e6:.2f} M alignments/s "
            f"({band_cells_per_s/1e9:.0f} G band-cells/s, 2kb pairs, "
            f"band {ALIGN_BAND})",
            file=sys.stderr,
        )

    chain_pairs_per_s = _bench_chain_dp(latency)
    print(
        f"[bench] chain DP on {backend}: {chain_pairs_per_s/1e9:.3f} G pairs/s",
        file=sys.stderr,
    )

    seed_reads_per_s = _bench_seeding(latency)
    print(
        f"[bench] mapping seed+join on {backend}: {seed_reads_per_s:.0f} reads/s "
        f"(10kb reads, 1M-entry index)",
        file=sys.stderr,
    )

    if on_tpu:
        full_map_reads_per_s = _bench_full_mapping(latency)
        print(
            f"[bench] FULL device mapping on {backend} (production 6-jit "
            f"split): {full_map_reads_per_s:.0f} reads/s "
            f"(10kb reads, 1M-entry index)",
            file=sys.stderr,
        )

    parity = _device_parity_check()
    print(f"[bench] device parity (mapping + f32 chaining vs host oracle): "
          f"{parity}", file=sys.stderr)

    # secondary: banded wavefront (opt-in — the Pallas remote Mosaic
    # compile can take ~10 min through the tunnel; watchdogged subprocess)
    if on_tpu and "--with-pallas" in sys.argv:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--pallas-probe"],
                capture_output=True,
                text=True,
                timeout=1200,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            band_cells = float(proc.stdout.strip().splitlines()[-1])
            print(
                f"[bench] banded wavefront (pallas): {band_cells/1e9:.1f} G band-cells/s",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"[bench] pallas probe failed/timed out: {exc}", file=sys.stderr)

    # CPU baseline in a subprocess (platform selection is process-global)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        cpu_cells_per_s = float(proc.stdout.strip().splitlines()[-1])
        print(
            f"[bench] Myers exact DP on cpu: {cpu_cells_per_s/1e9:.3f} GCUPS",
            file=sys.stderr,
        )
        vs_baseline = myers_cells_per_s / cpu_cells_per_s
    except Exception as exc:  # baseline failure shouldn't kill the bench
        print(f"[bench] cpu baseline failed: {exc}", file=sys.stderr)
        vs_baseline = 1.0

    print(
        json.dumps(
            {
                "metric": "myers_edit_distance_gcups",
                "value": round(myers_cells_per_s, 1),
                "unit": "cells/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
