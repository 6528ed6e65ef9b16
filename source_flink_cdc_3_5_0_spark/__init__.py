"""PySpark-native CDC pipeline engine.

A brand-new engine with the query / data-processing capabilities of Apache
Flink CDC 3.5.0 (reference: /root/reference), re-architected for Spark:

- the data plane is Spark DataFrames (Catalyst + Tungsten); change events are
  rows in a per-table changelog envelope (``__op`` column, optional
  ``__before`` struct);
- schema-change events are driver-side control messages applied to a versioned
  schema registry between (micro-)batches — Spark's micro-batch boundary is
  the global barrier the reference builds with FlushEvent + coordinator RPC;
- per-row transform expressions (projection / filter, MySQL-5 dialect) are
  transpiled by a small dialect shim and handed to Catalyst via ``F.expr`` so
  whole-stage codegen executes them JVM-side.

Extensions beyond the reference (joins, aggregations, dedup, similarity
search, text analysis) live in :mod:`.extensions` and ride on stock Spark.
"""

__version__ = "0.1.0"
