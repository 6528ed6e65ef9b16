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
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .pipeline import PipelineComposer, parse_yaml_pipeline

    with open(args.pipeline) as f:
        pdef = parse_yaml_pipeline(f.read())
    if args.name:
        pdef.config.name = args.name

    if _spark is not None:
        spark = _spark
    else:
        builder = (SparkSession.builder.master(args.master)
                   .appName(pdef.config.name)
                   .config("spark.sql.session.timeZone", pdef.config.local_time_zone)
                   .config("spark.sql.adaptive.enabled", "true"))
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


if __name__ == "__main__":
    sys.exit(main())
