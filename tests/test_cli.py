"""CLI surface: subcommand wiring, parquet-in → parquet-out, predicate
pushdown via --blocks-subset. Runs in-process (the CLI guards ray.init)."""
import glob
import shutil

import pyarrow.parquet as pq

from prclz_ray import cli

TMP = "/tmp/prclz_ray_test_cli"


def test_synth_blocks_complexity_roundtrip():
    shutil.rmtree(TMP, ignore_errors=True)
    cli.main(["synth", "--out", TMP, "--n-pages", "200"])
    assert pq.read_table(f"{TMP}/regions.parquet").num_rows == 12

    cli.main(["blocks", "--regions", f"{TMP}/regions.parquet",
              "--lines", f"{TMP}/lines.parquet", "--out", f"{TMP}/blocks"])
    blocks = pq.read_table(glob.glob(f"{TMP}/blocks/**/*.parquet",
                                     recursive=True))
    assert blocks.num_rows == 192  # 12 regions × 4×4 grid cells

    cli.main(["complexity", "--blocks", f"{TMP}/blocks",
              "--buildings", f"{TMP}/buildings.parquet",
              "--out", f"{TMP}/complexity",
              "--blocks-subset", "SYNA.1.1_1_0,SYNA.1.1_1_3"])
    comp = pq.read_table(glob.glob(f"{TMP}/complexity/**/*.parquet",
                                   recursive=True))
    assert comp.num_rows == 2
    assert set(comp["block_id"].to_pylist()) == {"SYNA.1.1_1_0",
                                                 "SYNA.1.1_1_3"}

    # --overwrite guard: second run without it skips (no exception)
    cli.main(["blocks", "--regions", f"{TMP}/regions.parquet",
              "--lines", f"{TMP}/lines.parquet", "--out", f"{TMP}/blocks"])
