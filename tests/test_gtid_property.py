"""Property tests for the shared MySQL GTID-set algebra (round-6, verdict
r5 item 10): `_parse_gtid_set` / `gtid_covers` (sources/vitess.py) and
`_advance` / `_gtid_set_str` (sources/mysql_binlog.py) are the ONE offset
primitive both the binlog source's resume filter and Vitess VGTID
containment hang on — verified here against a brute-force set-of-ints
model under randomized interval churn.

Reference parity: `io.debezium.connector.mysql.GtidSet` (add/contains),
Vitess `Mysql56GTIDSet.ContainsGTIDSet` (go/mysql/replication).
"""

from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.sources.mysql_binlog import (
    _advance, _gtid_set_str)
from source_flink_cdc_3_5_0_spark.sources.vitess import (
    _parse_gtid_set, gtid_covers)

UUIDS = ["6f6c9c3f-0000-0000-0000-000000000001",
         "6f6c9c3f-0000-0000-0000-000000000002",
         "6f6c9c3f-0000-0000-0000-000000000003"]

# a random GTID set as {uuid: frozenset of gnos}, kept small so coverage
# edge cases (adjacent, overlapping, contained intervals) occur often
gno_sets = st.dictionaries(
    st.sampled_from(UUIDS),
    st.frozensets(st.integers(1, 40), min_size=1, max_size=15),
    max_size=3)


def model_to_str(d: dict) -> str:
    """Render {uuid: set-of-ints} as a canonical GTID-set string with
    merged intervals (the model's ground-truth spelling)."""
    parts = []
    for u in sorted(d):
        gnos = sorted(d[u])
        ivs = []
        for g in gnos:
            if ivs and g == ivs[-1][1] + 1:
                ivs[-1] = (ivs[-1][0], g)
            else:
                ivs.append((g, g))
        parts.append(u + "".join(":%d-%d" % iv for iv in ivs))
    return ",".join(parts)


def parsed_to_set(parsed: dict) -> dict:
    return {u: frozenset(n for lo, hi in ivs for n in range(lo, hi + 1))
            for u, ivs in parsed.items()}


@given(gno_sets)
@settings(max_examples=200, deadline=None)
def test_parse_roundtrips_the_model(d):
    parsed = _parse_gtid_set(model_to_str(d))
    assert parsed_to_set(parsed) == {u: frozenset(v) for u, v in d.items()
                                     if v}


@given(gno_sets, gno_sets)
@settings(max_examples=300, deadline=None)
def test_covers_matches_set_containment(a, b):
    """gtid_covers(A, B) == model subset check, including multi-interval
    gaps, cross-uuid misses and the empty/`current` edge."""
    sa, sb = model_to_str(a), model_to_str(b)
    want = all(gnos <= a.get(u, frozenset()) for u, gnos in b.items())
    assert gtid_covers(sa, sb) == want
    # reflexivity and the empty set
    assert gtid_covers(sa, sa)
    assert gtid_covers(sa, "")
    assert gtid_covers(sa, "current")
    assert gtid_covers("MySQL56/" + sa, sb) == want  # Vitess spelling


@given(st.lists(st.tuples(st.sampled_from(UUIDS), st.integers(1, 30)),
                min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_advance_matches_incremental_model(txns):
    """Replaying GTID events one at a time (`_advance`, the binlog
    reader's running executed-set) always renders a canonical merged
    string equal to the model's, and the running set covers every prefix
    set (monotonicity — what makes resume filtering sound)."""
    running: dict = {}
    model: dict = {}
    prev = ""
    for uuid, gno in txns:
        _advance(running, uuid, gno)
        model.setdefault(uuid, set()).add(gno)
        cur = _gtid_set_str(running)
        assert cur == model_to_str(model)
        # intervals stay sorted, disjoint and non-adjacent (fully merged)
        for ivs in running.values():
            for (lo1, hi1), (lo2, hi2) in zip(ivs, ivs[1:]):
                assert hi1 + 1 < lo2
            assert all(lo <= hi for lo, hi in ivs)
        assert gtid_covers(cur, prev)  # the executed set only grows
        prev = cur


@given(gno_sets, st.sampled_from(UUIDS), st.integers(1, 40))
@settings(max_examples=200, deadline=None)
def test_advance_then_covers_single_txn(d, uuid, gno):
    """After advancing by (uuid, gno), the set covers exactly the old set
    plus that transaction."""
    running = {u: [] for u in ()}
    # build running from the model
    for u, gnos in d.items():
        for g in sorted(gnos):
            _advance(running, u, g)
    before = _gtid_set_str(running)
    _advance(running, uuid, gno)
    after = _gtid_set_str(running)
    assert gtid_covers(after, before)
    assert gtid_covers(after, "%s:%d" % (uuid, gno))
    covered_before = gno in d.get(uuid, frozenset())
    assert gtid_covers(before, "%s:%d" % (uuid, gno)) == covered_before
