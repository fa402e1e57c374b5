"""Measure the remote-compile cost of the device mapping jit vs shape.

Round-2 BASELINE.md found a compile cliff: (256, 16384)-read jits with
16384 anchor slots took 1728 s to compile through the axon tunnel and
the 65536-slot shape never finished.  This probe isolates compile time
(jit.lower().compile(), no execution) per (L, max_pos, max_per_hit)
combo so the production mapper can be tiled under the cliff, and checks
whether the persistent compilation cache (JAX_COMPILATION_CACHE_DIR)
actually hits across processes on this backend.

Usage: python scripts/compile_probe.py L MAX_POS MAX_PER_HIT [R=256] [split]
Prints one line: COMPILE L=.. S=.. seconds=..
(`split` probes the production two-jit pipeline: anchors | chaining tail)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np


def main() -> None:
    L = int(sys.argv[1])
    max_pos = int(sys.argv[2])
    max_per_hit = int(sys.argv[3])
    R = int(sys.argv[4]) if len(sys.argv) > 4 else 256

    import jax
    import jax.numpy as jnp

    from muchsalsa_tpu.ops.mapping_jax import (
        build_device_tables, map_reads_device_v2_packed, pack_codes)

    rng = np.random.default_rng(0)
    E = 1 << 20
    hashes = np.unique(np.sort(rng.integers(0, 1 << 32, E, dtype=np.uint32)))
    H = len(hashes)
    tables, hash_takes = build_device_tables(
        hashes, np.arange(H + 1, dtype=np.int64),
        rng.integers(0, 5000, H).astype(np.int32),
        rng.integers(0, 1000, H).astype(np.int32),
        rng.random(H) < 0.5,
    )
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    lens = jnp.asarray(np.full(R, L, dtype=np.int32))
    packed, nmask = pack_codes(codes)

    split = len(sys.argv) > 5 and sys.argv[5] == "split"
    if split:
        from muchsalsa_tpu.ops.mapping_jax import (
            anchors_to_hits_device, compact_candidates_device_v2,
            expand_anchors_device_v2, probe_candidates_device_v2,
            select_compact_device_v2, sketch_device_packed)

        kw_e = dict(max_per_hit=max_per_hit, hash_takes=hash_takes)
        kw_b = dict(k=15, bandwidth=2000, min_anchor_count=3,
                    min_chain_score=100)
        args_k = (jnp.asarray(packed), jnp.asarray(nmask), lens)
        t0 = time.perf_counter()
        comp_k = sketch_device_packed.lower(*args_k, k=15, w=5).compile()
        t_k = time.perf_counter() - t0
        sketch = comp_k(*args_k)
        selected, h, strand = sketch
        skey, h_s, n_sel = select_compact_device_v2(selected, h, strand)
        t0 = time.perf_counter()
        comp_p = probe_candidates_device_v2.lower(
            skey, h_s, tables.rp).compile()
        t_p = time.perf_counter() - t0
        rpv, cand = comp_p(skey, h_s, tables.rp)
        args_c = (skey, h_s, rpv, cand, n_sel)
        t0 = time.perf_counter()
        comp_c = compact_candidates_device_v2.lower(
            *args_c, max_pos=max_pos).compile()
        t_c = time.perf_counter() - t0
        sel = comp_c(*args_c)
        args_e = (*sel, tables.jrows, tables.erows)
        t0 = time.perf_counter()
        comp_e = expand_anchors_device_v2.lower(*args_e, **kw_e).compile()
        t_e = time.perf_counter() - t0
        anchors = comp_e(*args_e)
        t0 = time.perf_counter()
        comp_b = anchors_to_hits_device.lower(*anchors, **kw_b).compile()
        t_b = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = comp_b(*anchors)
        n = int(np.asarray(out["n_hits"]).sum())
        t_exec = time.perf_counter() - t0
        print(f"COMPILE-SPLIT R={R} L={L} max_pos={max_pos} A={max_per_hit} "
              f"S={max_pos*max_per_hit} sketch={t_k:.1f}s probe={t_p:.1f}s "
              f"compact={t_c:.1f}s expand={t_e:.1f}s tail={t_b:.1f}s "
              f"exec_tail={t_exec:.2f}s hits={n}", flush=True)
        return

    kw = dict(k=15, w=5, bandwidth=2000, min_anchor_count=3,
              min_chain_score=100, max_pos=max_pos,
              max_per_hit=max_per_hit, hash_takes=hash_takes)
    t0 = time.perf_counter()
    lowered = map_reads_device_v2_packed.lower(
        jnp.asarray(packed), jnp.asarray(nmask), lens,
        tables.rp, tables.jrows, tables.erows, **kw)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(jnp.asarray(packed), jnp.asarray(nmask), lens,
                   tables.rp, tables.jrows, tables.erows)
    n = int(np.asarray(out["n_hits"]).sum())
    t_exec = time.perf_counter() - t0
    print(f"COMPILE R={R} L={L} max_pos={max_pos} A={max_per_hit} "
          f"S={max_pos*max_per_hit} lower={t_lower:.1f}s "
          f"compile={t_compile:.1f}s exec1={t_exec:.2f}s hits={n}",
          flush=True)


if __name__ == "__main__":
    main()
