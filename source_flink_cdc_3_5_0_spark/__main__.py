"""CLI front-end: ``python -m source_flink_cdc_3_5_0_spark run job.yaml``.

Parity target: ``bin/flink-cdc.sh job.yaml`` → CliFrontend
(flink-cdc-cli/.../CliFrontend.java:66-88). Flags mirror the reference's
surface where meaningful on Spark (``--use-mini-cluster`` ≈ local master).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None, _spark=None) -> int:
    """``_spark``: inject an existing SparkSession (tests / embedding) —
    the CLI then neither builds nor stops it."""
    ap = argparse.ArgumentParser(prog="source_flink_cdc_3_5_0_spark",
                                 description="PySpark-native CDC pipeline engine")
    sub = ap.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run a YAML pipeline")
    run.add_argument("pipeline", help="pipeline YAML file")
    run.add_argument("--master", default="local[*]", help="Spark master (default local[*])")
    run.add_argument("--name", default=None, help="override pipeline name")
    run.add_argument("--shuffle-partitions", default=None, type=int)
    lake = sub.add_parser(
        "lake", help="snapshot-lake table maintenance "
        "(snapshots / compact / vacuum / rollback / tag)")
    lake.add_argument("root", help="lake root path (the sink's 'path')")
    lake.add_argument("table", help="table id, e.g. out.db.orders")
    lake.add_argument("action", choices=["snapshots", "compact", "vacuum",
                                         "rollback", "tag"])
    lake.add_argument("--mode", default=None, choices=["cow", "mor"],
                      help="only needed for tables without persisted "
                      "_table.json metadata")
    lake.add_argument("--num-buckets", type=int, default=None,
                      help="only needed for tables without persisted "
                      "_table.json metadata; must match if given")
    lake.add_argument("--order-by", default=None,
                      help="comma-separated cluster columns for compact")
    lake.add_argument("--zorder", default=None,
                      help="comma-separated z-order columns for compact")
    lake.add_argument("--files-per-bucket", type=int, default=1)
    lake.add_argument("--keep-last", type=int, default=1,
                      help="snapshots to retain on vacuum")
    lake.add_argument("--to-snapshot", type=int, default=None,
                      help="target seq for rollback / tag")
    lake.add_argument("--tag-name", default=None)
    lake.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    if args.cmd == "lake":
        return _lake_cmd(args, _spark)

    from pyspark.sql import SparkSession

    from .pipeline import PipelineComposer, parse_yaml_pipeline

    with open(args.pipeline) as f:
        pdef = parse_yaml_pipeline(f.read())
    if args.name:
        pdef.config.name = args.name

    if _spark is not None:
        spark = _spark
    else:
        from .common.session import apply_engine_confs

        builder = apply_engine_confs(
            SparkSession.builder.master(args.master)
            .appName(pdef.config.name)
            .config("spark.sql.session.timeZone", pdef.config.local_time_zone))
        shuffle = args.shuffle_partitions
        if shuffle is None and args.master.startswith("local"):
            import os as _os

            # local mode: track cores instead of Spark's 200 default (AQE
            # coalesces anyway, but small pipelines shouldn't schedule 200
            # tasks)
            shuffle = _os.cpu_count() or 8
        if shuffle:
            builder = builder.config("spark.sql.shuffle.partitions", str(shuffle))
        spark = builder.getOrCreate()
    try:
        composer = PipelineComposer(spark)
        if composer.is_streaming(pdef):
            pipe, raw, tables = composer.compose_streaming(pdef)
            q = pipe.start(raw, tables)
            q.awaitTermination()
            print(f"streaming pipeline {pdef.config.name!r} drained "
                  f"({len(pipe.registry.known_tables())} table(s))")
            return 0
        exe = composer.compose(pdef)
        exe.run()
        tables = exe.registry.known_tables()
        print(f"pipeline {pdef.config.name!r} finished: "
              f"{exe.batches_run} batch(es), {len(tables)} table(s)")
        return 0
    finally:
        if _spark is None:
            spark.stop()


def _lake_cmd(args, _spark) -> int:
    """Operational surface over SnapshotLakeSink — what an Iceberg user
    reaches via spark-sql CALL procedures (rewrite_data_files,
    expire_snapshots, rollback_to_snapshot)."""
    from .common.tableid import TableId
    from .sinks.lakehouse import SnapshotLakeSink

    tid = TableId.parse(args.table)
    # resolve bucket count + mode from the table's persisted metadata —
    # a guessed-wrong bucket count would silently break point-lookup
    # pruning, so the flags are only a fallback for pre-metadata tables
    sink = SnapshotLakeSink.for_table(
        args.root, tid, num_buckets=args.num_buckets, mode=args.mode)
    if args.action == "snapshots":
        seqs = sink.snapshots(tid)
        tags = sink.tags(tid)
        by_seq: dict[int, list[str]] = {}
        for name, s in tags.items():
            by_seq.setdefault(s, []).append(name)
        for s in seqs:
            suffix = f"  tags: {', '.join(sorted(by_seq[s]))}" \
                if s in by_seq else ""
            print(f"snapshot {s}{suffix}")
        return 0
    if args.action == "vacuum":
        removed = sink.vacuum(tid, keep_last=args.keep_last)
        print(f"vacuum removed {removed} file(s)")
        return 0
    if args.action == "rollback":
        if args.to_snapshot is None:
            print("rollback needs --to-snapshot", file=sys.stderr)
            return 2
        seq = sink.rollback(tid, args.to_snapshot)
        print(f"rolled back to snapshot {args.to_snapshot} "
              f"as new snapshot {seq}")
        return 0
    if args.action == "tag":
        if not args.tag_name:
            print("tag needs --tag-name", file=sys.stderr)
            return 2
        seq = sink.tag(tid, args.tag_name, snapshot=args.to_snapshot)
        print(f"tagged snapshot {seq} as {args.tag_name!r}")
        return 0
    # compact needs a session
    from pyspark.sql import SparkSession

    spark = _spark
    own = spark is None
    if own:
        from .common.session import apply_engine_confs

        spark = apply_engine_confs(
            SparkSession.builder.master(args.master)
            .appName("lake-maintenance")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")).getOrCreate()
    try:
        sink.compact(
            spark, tid,
            order_by=args.order_by.split(",") if args.order_by else None,
            zorder=args.zorder.split(",") if args.zorder else None,
            files_per_bucket=args.files_per_bucket)
        print(f"compacted; latest snapshot {sink.snapshots(tid)[-1]}")
        return 0
    finally:
        if own:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
