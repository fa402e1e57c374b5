#!/usr/bin/env python3
"""Benchmark: flagship device kernels on the current accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: anchor-chaining DP throughput (anchor pairs scored per
second) on the device, versus the same XLA computation on this host's
CPU (the stand-in for the reference's CPU-threaded chaining — the C++
reference cannot be built here: its cmake FetchContent needs network).

Extra detail (stderr): per-kernel numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

B, K, ITERS = 2048, 64, 20
WIGGLE = 300


def _bench_chain_dp() -> float:
    """Return anchor-pairs/s for the chaining DP on the active backend."""
    import jax

    from __graft_entry__ import _example_batch
    from muchsalsa_tpu.ops.chaining_jax import chain_dp_batch

    dtype = np.float64 if jax.config.read("jax_enable_x64") else np.float32
    batch = _example_batch(B, K, dtype)

    # warm-up / compile
    out = chain_dp_batch(batch, WIGGLE)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(ITERS):
        out = chain_dp_batch(batch, WIGGLE)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    pairs = B * K * K * ITERS
    return pairs / elapsed


def main() -> None:
    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(_bench_chain_dp())
        return

    import jax

    device_pairs_per_s = _bench_chain_dp()
    backend = jax.devices()[0].platform
    print(
        f"[bench] chain DP on {backend}: {device_pairs_per_s/1e9:.3f} G pairs/s",
        file=sys.stderr,
    )

    # CPU baseline in a subprocess (platform selection is process-global)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        cpu_pairs_per_s = float(proc.stdout.strip().splitlines()[-1])
        print(
            f"[bench] chain DP on cpu: {cpu_pairs_per_s/1e9:.3f} G pairs/s",
            file=sys.stderr,
        )
        vs_baseline = device_pairs_per_s / cpu_pairs_per_s
    except Exception as exc:  # baseline failure shouldn't kill the bench
        print(f"[bench] cpu baseline failed: {exc}", file=sys.stderr)
        vs_baseline = 1.0

    print(
        json.dumps(
            {
                "metric": "chain_dp_anchor_pairs_per_s",
                "value": round(device_pairs_per_s, 1),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
