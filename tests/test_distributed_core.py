"""True multi-process core assembly: 2 jax.distributed CPU processes
sharing the per-component fan-out, output byte-equal to single-process
(the multi-host form of the reference's job-per-component thread
fan-out, src/main.cpp:303-310 — VERDICT round-3 item 8)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

from muchsalsa_tpu.assemble.driver import assemble
from muchsalsa_tpu.testing.simulate import simulate, write_simulation

REPO = Path(__file__).resolve().parent.parent

OUT_FILES = ("temp_1.query.fa", "temp_1.align.paf", "temp_1.target.fa")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _simulated_inputs(tmp_path):
    # several disconnected genome islands -> several components to shard
    rng = np.random.default_rng(91)
    sims = [
        simulate(rng, genome_length=30_000, coverage=6.0, read_length=3_000)
        for _ in range(3)
    ]
    data = tmp_path / "data"
    data.mkdir()
    paf_lines: list[str] = []
    unitig_records: list[str] = []
    read_records: list[str] = []
    for gi, sim in enumerate(sims):
        paths = write_simulation(sim, tmp_path / f"sim{gi}")
        for line in Path(paths["paf"]).read_text().splitlines():
            cols = line.split("\t")
            if len(cols) < 12:
                continue
            cols[0] = f"g{gi}_{cols[0]}"
            cols[5] = f"g{gi}_{cols[5]}"
            paf_lines.append("\t".join(cols))
        for src, dst in (("unitigs", unitig_records), ("reads", read_records)):
            text = Path(paths[src]).read_text()
            dst.append(text.replace(">", f">g{gi}_"))
    paf = data / "mapped.paf"
    # terminate with a sentinel: the parser drops the final line
    paf.write_text("\n".join(paf_lines) + "\nsentinel\n")
    unitigs_fa = data / "unitigs.fa"
    unitigs_fa.write_text("".join(unitig_records))
    reads_fa = data / "reads.fa"
    reads_fa.write_text("".join(read_records))
    return paf, unitigs_fa, reads_fa


def test_two_process_core_matches_single(tmp_path):
    paf, unitigs_fa, reads_fa = _simulated_inputs(tmp_path)

    single_out = tmp_path / "single"
    summary = assemble(paf, unitigs_fa, reads_fa, single_out, workers=1)
    assert summary["paths"] >= 2, "fixture must produce multiple paths"
    assert summary["components"] >= 2, "fixture must produce multiple components"

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no virtual multi-device inside the procs
    outdirs = [tmp_path / f"proc{pid}" for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "scripts" / "distributed_core.py"),
             str(pid), "2", coordinator, str(paf), str(unitigs_fa),
             str(reads_fa), str(outdirs[pid])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{so}\n{se[-2000:]}"

    for name in OUT_FILES:
        expected = (single_out / name).read_bytes()
        for pid in range(2):
            assert (outdirs[pid] / name).read_bytes() == expected, (
                f"{name} diverged in process {pid}")


def test_distributed_branch_single_shard_identity(tmp_path):
    """process_count=1 through the distributed branch (identity
    allgather) is byte-equal to the sequential loop — the in-process
    smoke of the code path the 2-process test exercises for real."""
    paf, unitigs_fa, reads_fa = _simulated_inputs(tmp_path)

    single_out = tmp_path / "single"
    assemble(paf, unitigs_fa, reads_fa, single_out, workers=1)

    dist_out = tmp_path / "dist"
    # a non-None allgather routes through the distributed branch even
    # single-process — exercises index assignment + buffer merge
    assemble(paf, unitigs_fa, reads_fa, dist_out,
             process_index=0, process_count=1, allgather=lambda x: x)

    for name in OUT_FILES:
        assert (dist_out / name).read_bytes() == (
            single_out / name).read_bytes()
