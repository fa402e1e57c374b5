"""Golden-output regression test.

The reference has no golden tests (SURVEY.md §4); this pins the full
core-assembly output (contigs + query/PAF rows) for a fixed simulated
dataset.  Any change to ingest, chaining, graph reduction, linearization
or consensus that alters output will fail here — update the golden
hashes ONLY after verifying the new output is intentional
(``python tests/test_golden.py regen`` prints fresh hashes).
"""

import hashlib
import sys

import numpy as np

from muchsalsa_tpu.assemble.driver import assemble
from muchsalsa_tpu.testing.simulate import simulate, write_simulation

GOLDEN = {
    "temp_1.target.fa": "4fad37e13f9ee3329dbddead2d1ff551024e50fd322fa732a623df697a35b119",
    "temp_1.query.fa": "7e84ba77ac566dd1e5f7c326ccb5564a978cf04a89a72be395e2fcf558bc85f6",
    "temp_1.align.paf": "c73d27f236f849f0b5e7a6215bcfb1bd9629767edd93f13a4fe6a7b1c7be7dad",
}


def run_fixed_assembly(outdir):
    rng = np.random.default_rng(20260817)
    sim = simulate(
        rng,
        genome_length=60_000,
        unitig_length=1_100,
        unitig_gap=300,
        read_length=6_000,
        coverage=9.0,
        both_strands=True,
    )
    paths = write_simulation(sim, outdir / "data")
    assemble(paths["paf"], paths["unitigs"], paths["reads"], outdir / "out")
    return outdir / "out"


def hashes(out):
    return {
        name: hashlib.sha256((out / name).read_bytes()).hexdigest() for name in GOLDEN
    }


def test_golden_output(tmp_path):
    out = run_fixed_assembly(tmp_path)
    got = hashes(out)
    assert got == GOLDEN, f"golden mismatch: {got}"


if __name__ == "__main__" and "regen" in sys.argv:
    import tempfile
    from pathlib import Path

    out = run_fixed_assembly(Path(tempfile.mkdtemp()))
    print(hashes(out))
