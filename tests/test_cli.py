"""CLI front-end (python -m source_flink_cdc_3_5_0_spark run job.yaml —
CliFrontend.java:66-88 parity): batch pipeline end-to-end, name override,
bad args."""

import os

import duckdb
import pytest

from source_flink_cdc_3_5_0_spark.__main__ import main


def _yaml(tmp_path, sink_path):
    y = tmp_path / "job.yaml"
    y.write_text("""
source:
  type: parquet
  tables: '{"tpch.main.nation": "/root/testdata/sf0.001/nation.parquet"}'
  primary-keys: '{"tpch.main.nation": ["n_nationkey"]}'
sink: {type: parquet, path: %s}
transform:
  - source-table: tpch.main.\\.*
    projection: "n_nationkey, UPPER(n_name) AS name_u"
    filter: "n_regionkey <> 0"
""" % sink_path)
    return str(y)


def test_cli_run_batch(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = main(["run", _yaml(tmp_path, out_dir)], _spark=spark)
    assert rc == 0
    assert "finished" in capsys.readouterr().out
    got = sorted(
        (r["n_nationkey"], r["name_u"]) for r in spark.read.parquet(
            os.path.join(out_dir, "tpch.main.nation", "data")).collect())
    want = sorted(tuple(r) for r in duckdb.sql(
        "SELECT n_nationkey, upper(n_name) FROM "
        "'/root/testdata/sf0.001/nation.parquet' WHERE n_regionkey <> 0"
    ).fetchall())
    assert got == want


def test_cli_name_override_and_bad_cmd(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out2")
    rc = main(["run", _yaml(tmp_path, out_dir), "--name", "renamed"],
              _spark=spark)
    assert rc == 0
    assert "renamed" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        main(["frobnicate"], _spark=spark)
