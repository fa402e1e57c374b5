"""Output parity against the ACTUAL reference binary.

Round-1 verdict item: the golden test pinned the repo's own hashes; this
test builds the reference C++ assembler offline (scripts/build_reference.sh
with the vendored GSL shim, bypassing the network-needing FetchContent at
reference libms/CMakeLists.txt:6-16) and asserts, per simulated dataset:

- ``temp_1.target.fa`` (the assembly) is byte-identical,
- ``temp_1.query.fa`` and ``temp_1.align.paf`` are identical as multisets
  once the incidental per-record index numbering is stripped (the reference
  emits query records in unordered_map iteration order — ap.cpp:1052 — so
  the ``Left.<path>.<n>`` suffixes are not semantically ordered).
"""

from __future__ import annotations

import collections
import re
import subprocess
from pathlib import Path

import numpy as np
import pytest

from muchsalsa_tpu.assemble.driver import assemble
from muchsalsa_tpu.testing.simulate import simulate, write_simulation

REPO = Path(__file__).resolve().parent.parent
REF_BIN = REPO / "build_ref" / "muchsalsa"
BUILD_SCRIPT = REPO / "scripts" / "build_reference.sh"


@pytest.fixture(scope="session")
def reference_binary():
    if not REF_BIN.exists():
        r = subprocess.run(
            ["bash", str(BUILD_SCRIPT)], capture_output=True, text=True, timeout=600
        )
        if r.returncode != 0 or not REF_BIN.exists():
            pytest.skip(f"reference binary build failed: {r.stderr[-500:]}")
    return REF_BIN


def _strip_idx(name: bytes) -> bytes:
    if re.match(rb"^(Left|Right|Middle|Contain_[A-Za-z_]+)\.", name):
        return re.sub(rb"\.\d+$", b"", name)
    return name


def _fasta_multiset(path: Path) -> collections.Counter:
    recs: collections.Counter = collections.Counter()
    name, seq = None, []
    for line in path.read_bytes().split(b"\n"):
        if line.startswith(b">"):
            if name is not None:
                recs[(_strip_idx(name), b"".join(seq))] += 1
            name, seq = line[1:], []
        elif line:
            seq.append(line)
    if name is not None:
        recs[(_strip_idx(name), b"".join(seq))] += 1
    return recs


def _paf_multiset(path: Path) -> collections.Counter:
    rows: collections.Counter = collections.Counter()
    for line in path.read_bytes().split(b"\n"):
        if not line:
            continue
        f = line.split(b"\t")
        rows[(_strip_idx(f[0]), *f[1:])] += 1
    return rows


CONFIGS = [
    # (seed, genome, unitig_len, gap, read_len, coverage, both_strands)
    (20260817, 60_000, 1_100, 300, 6_000, 9.0, True),
    (7, 30_000, 1_200, 250, 5_000, 10.0, False),
    (99, 45_000, 900, 350, 5_500, 11.0, True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(c[0]) for c in CONFIGS])
def test_parity_vs_reference_binary(tmp_path, reference_binary, cfg):
    seed, glen, ulen, gap, rlen, cov, both = cfg
    rng = np.random.default_rng(seed)
    sim = simulate(
        rng,
        genome_length=glen,
        unitig_length=ulen,
        unitig_gap=gap,
        read_length=rlen,
        coverage=cov,
        both_strands=both,
    )
    paths = write_simulation(sim, tmp_path / "data")

    refout = tmp_path / "refout"
    refout.mkdir()
    r = subprocess.run(
        [
            str(reference_binary),
            str(paths["paf"]),
            str(paths["unitigs"]),
            str(paths["reads"]),
            str(refout),
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr

    myout = tmp_path / "myout"
    assemble(paths["paf"], paths["unitigs"], paths["reads"], myout)

    ref_target = (refout / "temp_1.target.fa").read_bytes()
    my_target = (myout / "temp_1.target.fa").read_bytes()
    assert my_target == ref_target, "assembly FASTA differs from reference binary"

    assert _fasta_multiset(myout / "temp_1.query.fa") == _fasta_multiset(
        refout / "temp_1.query.fa"
    )
    assert _paf_multiset(myout / "temp_1.align.paf") == _paf_multiset(
        refout / "temp_1.align.paf"
    )
