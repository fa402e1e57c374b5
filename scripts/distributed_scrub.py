"""One process of the cross-host streaming scrub (SURVEY.md §2.5:
"per-host read sharding + collective merge of overlap edges").

Each process computes the all-vs-all overlaps of its round-robin share
of BFS subsets; the per-subset record lists cross the network through
``jax_record_allgather`` (multihost_utils over jax.distributed); every
process then replays the merge/emit pass in subset order, so the output
is identical to a single-host run (process 0 writes it).

Usage:
  python scripts/distributed_scrub.py <pid> <nprocs> <coordinator> \
      <reads.fa> <mapped.paf> <out.fa> [subset_size]
"""

from __future__ import annotations

import sys
from pathlib import Path


def main() -> None:
    pid, n = int(sys.argv[1]), int(sys.argv[2])
    coordinator = sys.argv[3]
    reads_fa, paf_path, out_fa = sys.argv[4], sys.argv[5], Path(sys.argv[6])
    subset_size = int(sys.argv[7]) if len(sys.argv) > 7 else 60_000

    import jax

    jax.config.update("jax_platforms", "cpu")
    from muchsalsa_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator, n, pid)
    assert jax.process_count() == n, jax.process_count()

    import dataclasses

    from muchsalsa_tpu.config import MapperConfig, ScrubConfig
    from muchsalsa_tpu.io.fasta import SequenceStore, write_fasta
    from muchsalsa_tpu.pipeline.scrubber import jax_record_allgather, scrub_reads

    reads = SequenceStore()
    reads.load(reads_fa)
    lines = Path(paf_path).read_text().splitlines()
    scfg = dataclasses.replace(ScrubConfig(), subset_size=subset_size)

    out = scrub_reads(
        lines, reads, scfg, MapperConfig(),
        process_index=pid, process_count=n, allgather=jax_record_allgather,
    )
    if pid == 0:
        write_fasta(out_fa, out)
        print(f"[distributed_scrub] {len(out)} records -> {out_fa}")


if __name__ == "__main__":
    main()
