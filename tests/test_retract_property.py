"""Property test (second lens) on the retract-stream changelog algebra:
randomized -U/+U/-D scripts with MIXED update conventions in ONE batch —
single +U events carrying a before-image interleaved with -U/+U retract
pairs, exactly the mix DataChangeEvent.java:82-93 permits on one stream —
must always reduce to the same result as materializing the final state
and aggregating it.  Covers incremental_agg (both conventions at once and
the derived pure-pair form) and incremental_distinct_count (pair form,
its documented contract when members can change)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from source_flink_cdc_3_5_0_spark.common.events import BEFORE_COL, OP_COL
from source_flink_cdc_3_5_0_spark.operators.retract import (
    incremental_agg,
    incremental_distinct_count,
)
from source_flink_cdc_3_5_0_spark.sources.base import SEQ_COL


@st.composite
def changelog_scripts(draw):
    """A random keyed churn script.  Returns (events, final_state):
    events = [(k, g, v, bv, op, seq)] with bv set only on single-+U
    events; final_state = {k: live value}."""
    n_keys = draw(st.integers(2, 8))
    n_events = draw(st.integers(1, 30))
    events, state = [], {}
    seq = 0
    next_v = 1
    for _ in range(n_events):
        k = draw(st.integers(0, n_keys - 1))
        g = f"g{k % 3}"
        if k not in state:
            v, next_v = next_v, next_v + 1
            events.append((k, g, v, None, "+I", seq))
            state[k] = v
            seq += 1
            continue
        action = draw(st.sampled_from(["upd_single", "upd_pair", "delete"]))
        old = state[k]
        if action == "delete":
            events.append((k, g, old, None, "-D", seq))
            del state[k]
            seq += 1
        elif action == "upd_single":
            # one +U carrying the before image (Debezium 'u' without an
            # emitted retract)
            v, next_v = next_v, next_v + 1
            events.append((k, g, v, old, "+U", seq))
            state[k] = v
            seq += 1
        else:
            # Flink retract pair: -U(before) then +U(after), no image
            v, next_v = next_v, next_v + 1
            events.append((k, g, old, None, "-U", seq))
            events.append((k, g, v, None, "+U", seq + 1))
            state[k] = v
            seq += 2
    return events, state


def _to_df(spark, events):
    df = spark.createDataFrame(
        events,
        f"k long, g string, v long, bv long, {OP_COL} string, "
        f"{SEQ_COL} long")
    return df.withColumn(
        BEFORE_COL, F.when(F.col("bv").isNotNull(), F.struct(F.col("bv"))))


def _pairify(events):
    """The derived pure-pair form: every single +U with a before image is
    expanded into its -U/+U pair (the convention incremental_distinct
    requires when members can change)."""
    out = []
    seq = 0
    for k, g, v, bv, op, _ in events:
        if op == "+U" and bv is not None:
            out.append((k, g, bv, None, "-U", seq))
            out.append((k, g, v, None, "+U", seq + 1))
            seq += 2
        else:
            out.append((k, g, v, bv, op, seq))
            seq += 1
    return out


def _expected(state):
    agg = {}
    for k, v in state.items():
        g = f"g{k % 3}"
        n, s = agg.get(g, (0, 0))
        agg[g] = (n + 1, s + v)
    return agg


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(script=changelog_scripts())
def test_mixed_convention_batch_equals_final_state(spark, script):
    events, state = script
    got = {r["g"]: (r["n_rows"], r["sum_value"]) for r in
           incremental_agg(_to_df(spark, events), ["g"], F.col("v"),
                           before_value=F.col(f"{BEFORE_COL}.bv"))
           .collect()}
    assert got == _expected(state)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(script=changelog_scripts())
def test_pairified_script_agrees_with_mixed(spark, script):
    """Expanding the mixed batch into the pure retract-pair convention
    (no before images anywhere) must reduce to the same aggregate."""
    events, state = script
    paired = _pairify(events)
    got = {r["g"]: (r["n_rows"], r["sum_value"]) for r in
           incremental_agg(_to_df(spark, paired), ["g"], F.col("v"))
           .collect()}
    assert got == _expected(state)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(script=changelog_scripts())
def test_distinct_maintenance_matches_final_state(spark, script):
    """COUNT(DISTINCT v % 5) maintained from the pair-form changelog
    equals the distinct count over the materialized final state."""
    events, state = script
    df = _to_df(spark, _pairify(events)).withColumn("m", F.col("v") % 5)
    got = {r["g"]: r["n_distinct"] for r in
           incremental_distinct_count(df, ["g"], "m").collect()}
    want = {}
    for k, v in state.items():
        want.setdefault(f"g{k % 3}", set()).add(v % 5)
    assert got == {g: len(ms) for g, ms in want.items()}
