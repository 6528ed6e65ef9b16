"""Integer-scaled PageRank (extensions/graph)."""

import pytest

from source_flink_cdc_3_5_0_spark.extensions.graph import SCALE, pagerank


def _run(spark, edge_rows, node_ids, **kw):
    e = spark.createDataFrame(edge_rows, "src BIGINT, dst BIGINT")
    n = spark.createDataFrame([(v,) for v in node_ids], "v BIGINT")
    return {r.v: r.rank_scaled for r in pagerank(e, n, **kw).collect()}


def test_symmetric_cycle_uniform(spark):
    # 3-cycle: perfectly symmetric, every node keeps exactly SCALE
    got = _run(spark, [(0, 1), (1, 2), (2, 0)], [0, 1, 2], iterations=5)
    assert set(got.values()) == {SCALE}


def test_sink_node_ranks_highest(spark):
    # 0 and 1 both link to 2; 2 links back to 0. The 0<->2 cycle makes
    # their ranks oscillate by iteration parity while converging, so
    # compare the parity-free quantities: the no-in-link node holds base
    # mass only and both cycle members exceed it at any iteration.
    got = _run(spark, [(0, 2), (1, 2), (2, 0)], [0, 1, 2], iterations=10)
    assert got[1] == (SCALE * 15) // 100  # no in-links -> base only
    assert got[0] > got[1] and got[2] > got[1]
    # averaged over a parity pair, the in-degree-2 node wins
    nxt = _run(spark, [(0, 2), (1, 2), (2, 0)], [0, 1, 2], iterations=11)
    assert got[2] + nxt[2] > got[0] + nxt[0]


def test_duplicate_edges_collapse(spark):
    a = _run(spark, [(0, 1), (0, 1), (1, 0)], [0, 1], iterations=4)
    b = _run(spark, [(0, 1), (1, 0)], [0, 1], iterations=4)
    assert a == b


def test_dangling_node_leaks_no_crash(spark):
    # 1 has no out-links: its mass leaks (simple variant, documented)
    got = _run(spark, [(0, 1)], [0, 1], iterations=3)
    assert got[0] == (SCALE * 15) // 100
    assert got[1] > got[0]


def test_iterations_zero_is_initial_vector(spark):
    got = _run(spark, [(0, 1)], [0, 1], iterations=0)
    assert set(got.values()) == {SCALE}


def test_bad_damping_rejected(spark):
    with pytest.raises(ValueError):
        _run(spark, [(0, 1)], [0, 1], damping_pct=101)
