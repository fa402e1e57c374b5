"""One process of the cross-host core assembly (SURVEY.md §2.5 row 4:
component fan-out — the multi-host form of the reference's
job-per-component thread fan-out, src/main.cpp:303-310).

Every process replays the deterministic graph phases (ingest -> edges
-> chaining -> contraction -> spanning), then assembles its round-robin
share of connected components; path lists and output buffers cross the
network through ``jax_record_allgather`` (multihost_utils over
jax.distributed), and every process writes the identical byte-equal
output (the caller keeps process 0's directory).

Usage:
  python scripts/distributed_core.py <pid> <nprocs> <coordinator> \
      <mapped.paf> <unitigs.fa> <reads.fa> <outdir>
"""

from __future__ import annotations

import sys
from pathlib import Path


def main() -> None:
    pid, n = int(sys.argv[1]), int(sys.argv[2])
    coordinator = sys.argv[3]
    paf, unitigs_fa, reads_fa = sys.argv[4], sys.argv[5], sys.argv[6]
    outdir = Path(sys.argv[7])

    import jax

    jax.config.update("jax_platforms", "cpu")
    from muchsalsa_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator, n, pid)
    assert jax.process_count() == n, jax.process_count()

    from muchsalsa_tpu.assemble.driver import assemble
    from muchsalsa_tpu.pipeline.scrubber import jax_record_allgather

    outdir.mkdir(parents=True, exist_ok=True)
    summary = assemble(
        paf, unitigs_fa, reads_fa, outdir,
        process_index=pid, process_count=n,
        allgather=jax_record_allgather,
    )
    print(f"[distributed_core] p{pid}/{n}: components="
          f"{summary['components']} paths={summary['paths']}", flush=True)


if __name__ == "__main__":
    main()
