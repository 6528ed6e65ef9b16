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


def test_cli_lake_maintenance(spark, tmp_path, capsys):
    """lake subcommand: snapshots listing with tags, clustered compact,
    rollback, vacuum — the CALL-procedure surface of a real table
    format."""
    from pyspark.sql import functions as F

    from source_flink_cdc_3_5_0_spark.common.events import CreateTableEvent
    from source_flink_cdc_3_5_0_spark.common.schema import Schema
    from source_flink_cdc_3_5_0_spark.common.tableid import TableId
    from source_flink_cdc_3_5_0_spark.sinks.lakehouse import SnapshotLakeSink
    from source_flink_cdc_3_5_0_spark.sources.base import attach_envelope

    root = str(tmp_path / "lake")
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "user_id", "value"))
    tid = TableId.parse("out.db.events")
    schema = Schema.from_struct_type(ev.schema, primary_keys=["event_id"])
    sink = SnapshotLakeSink(root, num_buckets=2)
    sink.metadata_applier().apply_schema_change(
        tid, CreateTableEvent(tid, schema), schema)
    sink.write(tid, attach_envelope(ev, "+I", seq=0), schema, batch_id=0)

    assert main(["lake", root, "out.db.events", "tag",
                 "--tag-name", "v1", "--num-buckets", "2"],
                _spark=spark) == 0
    assert main(["lake", root, "out.db.events", "compact",
                 "--order-by", "value", "--files-per-bucket", "4",
                 "--num-buckets", "2"], _spark=spark) == 0
    assert main(["lake", root, "out.db.events", "snapshots",
                 "--num-buckets", "2"], _spark=spark) == 0
    out = capsys.readouterr().out
    assert "tags: v1" in out and "snapshot 1" in out
    kept, total = sink.scan_files(
        tid, filters=[("value", ">", 300.0)])
    assert len(kept) < total  # the CLI compact clustered for real
    assert main(["lake", root, "out.db.events", "rollback",
                 "--to-snapshot", "0", "--num-buckets", "2"],
                _spark=spark) == 0
    assert main(["lake", root, "out.db.events", "vacuum",
                 "--keep-last", "1", "--num-buckets", "2"],
                _spark=spark) == 0
    # tagged snapshot 0 survives; rollback target still reads
    assert 0 in sink.snapshots(tid)
    assert sink.read(spark, tid).count() == ev.count()
    # error paths
    assert main(["lake", root, "out.db.events", "rollback",
                 "--num-buckets", "2"], _spark=spark) == 2
    assert main(["lake", root, "out.db.events", "tag",
                 "--num-buckets", "2"], _spark=spark) == 2
