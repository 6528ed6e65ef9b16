"""Replicates the driver's correctness gate locally: every oracle-backed
query in __spark_entry__ must match DuckDB on row count, column names and
order-insensitive values at sf0.001 (fast; the driver runs sf0.01)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def _duck_con():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def _rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, name):
    try:
        sdf = _QUERIES[name](spark, SF_DIR)
    except NotImplementedError as e:
        # skip ONLY the named environment gates (a clean checkout
        # without PostgreSQL binaries must not fail) — any other
        # NotImplementedError reaching a parity query is a real defect
        # this suite exists to catch, so it stays red
        if "real-server interop gate" in str(e):
            pytest.skip(str(e))
        raise
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck_con()
    res = con.execute(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _rows_key(scols, srows) == _rows_key(dcols, drows), f"{name}: values differ"


_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", _ROWS_ONLY or [None])
def test_rows_only_queries_run(spark, name):
    if name is None:
        pytest.skip("every queries() entry currently has a DuckDB oracle — "
                    "no rows-only queries left to smoke-test (this is the "
                    "desired state, not a gap)")
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
