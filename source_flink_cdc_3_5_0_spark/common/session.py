"""Engine-owned Spark session tuning — the ONE place that knows the
performance confs the engine's operators assume.

Round-12 (verdict r11 item 3): the AQE ``minPartitionSize`` floor lived
only in ``bench.py``, so the bench measured a configuration the engine
never shipped — library users composing pipelines through
``PipelineComposer`` / the CLI ran the decode stages starved to ~5 tasks
by byte-based coalescing. The floor (and any future engine-wide session
conf) now lives here; ``bench.py`` / ``bench_scale.py`` / the CLI all
inherit it.

Why the floor: AQE partition coalescing targets BYTES, but the engine's
codec/decode operators are CPU-dense at ~µs/row over small shuffle
payloads — with the 1m default a 6 MB post-agg exchange coalesces to ~5
tasks and a 9.8 s-CPU decode stage runs 5-way on a 32-core host (r11
profile: cdc_db2_asn). Lowering the floor keeps
``coalescePartitions.parallelismFirst`` actually parallel. At production
shuffle sizes every partition exceeds any of these values, so the floor
is inert there — it only matters where small-byte/high-CPU stages meet
many cores. Override per deployment via ``SPARK_GRAFT_AQE_MIN_PARTITION``
(any Spark byte string, e.g. ``1m`` to restore the stock default).
"""

from __future__ import annotations

import os


def engine_session_confs() -> dict[str, str]:
    """Session confs the engine recommends wherever IT builds the session.
    Deliberately tiny: only settings whose rationale is an engine operator
    profile, parameterised by env for non-local deployments."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize":
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
    }


def apply_engine_confs(builder):
    """Fold :func:`engine_session_confs` into a SparkSession.Builder."""
    for k, v in engine_session_confs().items():
        builder = builder.config(k, v)
    return builder
