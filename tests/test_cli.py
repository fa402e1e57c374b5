"""CLI smoke tests (core / map / config subcommands)."""

import json

import numpy as np

from muchsalsa_tpu.pipeline.cli import main
from muchsalsa_tpu.testing.simulate import simulate, write_simulation


def test_cli_config(capsys):
    assert main(["config"]) == 0
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert cfg["graph"]["wiggle_room"] == 300


def test_cli_core_and_map(tmp_path, capsys):
    rng = np.random.default_rng(3)
    sim = simulate(rng, genome_length=20_000, coverage=8.0)
    paths = write_simulation(sim, tmp_path / "data")

    outdir = tmp_path / "out"
    rc = main(
        ["core", str(paths["paf"]), str(paths["unitigs"]), str(paths["reads"]),
         str(outdir), "8", "300"]
    )
    assert rc == 0
    assert (outdir / "temp_1.target.fa").stat().st_size > 0
    assert "Finished assembly" in capsys.readouterr().out

    out_paf = tmp_path / "mapped.paf"
    rc = main(["map", str(paths["unitigs"]), str(paths["reads"]), str(out_paf)])
    assert rc == 0
    assert out_paf.stat().st_size > 0
    cols = out_paf.read_text().splitlines()[0].split("\t")
    assert len(cols) == 12
