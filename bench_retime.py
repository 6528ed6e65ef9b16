"""Isolated authoritative re-times for bench movers (verdict r8 item 2).

The per-round BENCH_FULL run shares one long-lived JVM across ~140
queries, so KVM steal bursts and accrued GC state can inflate individual
numbers in ways the committed record can't adjudicate. This tool re-times
named queries each in a FRESH Spark session (own process, min of 3 after
one warm-up) and merges the results into BENCH_FULL.json under
``retimes`` — flagged as the authoritative number for that query.

Usage:
    python bench_retime.py q1 [q2 ...]        # re-time named queries
    python bench_retime.py --auto PREV.json   # re-time every query whose
                                              # BENCH_FULL number moved
                                              # >1.5x vs PREV's (commit
                                              # protocol: PREV = the last
                                              # committed record,
                                              # `git show HEAD:BENCH_FULL.json`)
    python bench_retime.py --one NAME         # internal: one query in
                                              # this process, prints JSON

Each re-time line records the three runs, the min, the host-noise stamp
for the re-time window, and the run_id of the record it adjudicates.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (SF_DIR / CPUS / noise probes / registries)

MOVER_RATIO = 1.5


def _time_one_inprocess(name: str) -> dict:
    """Fresh session, one untimed warm-up, min of 3 timed runs."""
    import time

    from pyspark.sql import SparkSession

    from source_flink_cdc_3_5_0_spark import entry_queries as EQ
    from source_flink_cdc_3_5_0_spark.common.session import apply_engine_confs

    # engine confs (AQE floor) included so an isolated retime measures the
    # SAME configuration as the full bench run it adjudicates — before
    # round 12 this builder lacked the floor and retimes silently ran a
    # different config than bench.py
    spark = (
        apply_engine_confs(SparkSession.builder.master(f"local[{bench.CPUS}]"))
        .appName(f"cdc-engine-retime-{name}")
        .config("spark.sql.shuffle.partitions", bench.CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = EQ.QUERIES[name]
    before = bench._host_noise_probe()
    fn(spark, bench.SF_DIR).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, bench.SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    noise = bench._noise_stamp(before, bench._host_noise_probe())
    spark.stop()
    return {"sec": min(runs), "runs": runs,
            "protocol": "isolated fresh-session min-of-3 (1 warm-up)",
            "host_noise": noise}


def _retime_subprocess(name: str) -> dict:
    """Run one re-time in its own process so sessions never share a JVM
    (the whole point of 'isolated')."""
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", name],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_FULL.json")
    if sys.argv[1:2] == ["--one"]:
        print(json.dumps(_time_one_inprocess(sys.argv[2])))
        return
    if sys.argv[1:2] == ["--auto"]:
        prev = json.load(open(sys.argv[2]))
        prev_q = prev.get("queries") or (prev.get("parsed") or {}).get(
            "queries", {})
        cur_q = json.load(open(full_path))["queries"]
        names = sorted(
            q for q in cur_q
            if q in prev_q and prev_q[q] > 0 and cur_q[q] > 0
            and (cur_q[q] / prev_q[q] > MOVER_RATIO
                 or prev_q[q] / cur_q[q] > MOVER_RATIO))
        if not names:
            print("no >%.1fx movers vs %s" % (MOVER_RATIO, sys.argv[2]))
            return
        print("movers: %s" % ", ".join(names))
    else:
        names = sys.argv[1:]
        if not names:
            print(__doc__)
            return
    unknown = [n for n in names if n not in bench.BENCH_QUERIES]
    if unknown:
        raise SystemExit("not benched queries: %s" % unknown)
    full = json.load(open(full_path))
    retimes = full.setdefault("retimes", {})
    for name in names:
        rec = _retime_subprocess(name)
        rec["adjudicates_run_id"] = full.get("run_id")
        retimes[name] = rec
        print("%s: %.3f s (runs %s, steal %s)" % (
            name, rec["sec"], rec["runs"],
            rec["host_noise"].get("steal_ticks")))
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    print("merged %d retimes into %s" % (len(names), full_path))


if __name__ == "__main__":
    main()
