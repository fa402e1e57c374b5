"""E. coli-scale core assembly ON THE DEVICE, with parity asserted.

Round-2 verdict item: run the real assembler with the device path
(`config.device.use_device=True`, default) on the real TPU and compare
its output byte-for-byte against the host-oracle chaining path in the
same process — settling the f32-compat-boundary question
(ops/chaining_jax.py rel<=15 rule) empirically at scale.

Usage: python scripts/tpu_core_run.py [genome_mb=4.6] [coverage=15] [out=/tmp/tpu_core]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

# persistent compile cache: without it every jit recompiles through the
# remote tunnel (~30-60s each) and the timing measures the compiler
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

from muchsalsa_tpu.config import Config
from muchsalsa_tpu.testing.simulate import simulate, write_simulation


def main() -> None:
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.6
    coverage = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else Path("/tmp/tpu_core")
    out.mkdir(parents=True, exist_ok=True)

    import jax

    platform = jax.devices()[0].platform
    print(f"[tpu_core] backend: {platform} ({jax.devices()})")

    rng = np.random.default_rng(20260819)
    t0 = time.perf_counter()
    sim = simulate(
        rng,
        genome_length=int(genome_mb * 1e6),
        coverage=coverage,
        read_length=9_000,
        unitig_length=1_000,
        unitig_gap=300,
    )
    paths = write_simulation(sim, out / "data")
    n_reads = sum(1 for _ in sim.read_records())
    print(f"[tpu_core] simulated {genome_mb} Mb, {n_reads} reads "
          f"in {time.perf_counter()-t0:.1f}s")

    from muchsalsa_tpu.assemble.driver import assemble

    results = {}
    for label, use_device in (("device", True), ("host", False)):
        cfg = Config()
        # chain_device_min_problems=0: actually exercise device chaining
        # at this scale (the size gate exists for cache-cold processes;
        # with the persistent executable cache the compile is once-ever)
        cfg = dataclasses.replace(
            cfg, device=dataclasses.replace(
                cfg.device, use_device=use_device,
                chain_device_min_problems=0))
        t0 = time.perf_counter()
        r = assemble(paths["paf"], paths["unitigs"], paths["reads"],
                     out / label, cfg)
        wall = time.perf_counter() - t0
        stages = {k: round(v, 2) for k, v in r["timer"].stages.items()}
        print(f"[tpu_core] {label} ({platform if use_device else 'cpu-oracle'}): "
              f"{wall:.1f}s  stages={json.dumps(stages)}")
        results[label] = dict(wall=wall, stages=stages, paths=r["paths"])

    same = True
    for fname in ("temp_1.target.fa", "temp_1.query.fa", "temp_1.align.paf"):
        a = (out / "device" / fname).read_bytes()
        b = (out / "host" / fname).read_bytes()
        status = "IDENTICAL" if a == b else "DIFFERS"
        same = same and a == b
        print(f"[tpu_core] {fname}: {status}")
    print(f"[tpu_core] PARITY: {'PASS' if same else 'FAIL'}")
    (out / "summary.json").write_text(json.dumps(
        dict(platform=platform, genome_mb=genome_mb, coverage=coverage,
             n_reads=n_reads, parity=same, results=results), indent=2))
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
