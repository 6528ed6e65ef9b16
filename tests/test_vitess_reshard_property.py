"""Model-based randomized lifecycle test for the Vitess reshard state
machine (`advance_stream_state` — the pure transition behind the runner's
`fold_vstream_batch`), the same second-lens approach the sharded lake
manifest got.

A reference model maintains the TRUE serving set (random splits at byte
boundaries and merges of adjacent shards) and per-shard GTID counters;
batches reveal events from random shard subsets — including partial split
visibility (one child speaks, the sibling stays quiet for a batch or two).
Invariants after every transition:

- the persisted serving set always tiles the keyspace-id space;
- no surviving (keyspace, shard) VGTID entry ever regresses
  (`gtid_covers(new, old)`);
- once a reshard quiesces, the state's serving set equals the model's and
  retired parents'/merged children's entries are gone;
- `stop_on_reshard` halts with the boundary folded from known shards only,
  partial children held ``pending``, no fabricated child positions.

No Spark in this file — pure control-plane logic.
"""

import json

from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.sources.vitess import (
    ShardRange, VitessStreamState, advance_stream_state, gtid_covers,
    shards_tile,
)

KS = "shop"


def vgtid_json(positions):
    return json.dumps([{"keyspace": KS, "shard": s, "gtid": g}
                       for s, g in positions])


def row(shard, gtid):
    return {"shard": shard, "keyspace": KS,
            "vgtid": vgtid_json([(shard, gtid)])}


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_reshard_state_machine_random_lifecycle(data):
    true = [ShardRange.parse("-")]
    counters = {"-": 0}
    state = VitessStreamState()
    last_pos: dict = {}

    def emit(shard_ranges):
        nonlocal state
        rows = []
        for r in shard_ranges:
            counters[r.name] += 1
            rows.append(row(r.name, "u1:1-%d" % counters[r.name]))
        state, keep = advance_stream_state(rows, state)
        assert keep is False
        assert shards_tile(list(state.shards))
        for g in state.vgtid.shard_gtids:
            old = last_pos.get((g.keyspace, g.shard))
            if old is not None:
                assert gtid_covers(g.gtid, old), (g, old)
            last_pos[(g.keyspace, g.shard)] = g.gtid

    emit(true)  # first contact adopts the baseline serving set
    assert state.shards == tuple(sorted(r.name for r in true))

    for _ in range(data.draw(st.integers(2, 10))):
        op = data.draw(st.sampled_from(["batch", "split", "merge"]))
        if op == "batch":
            k = data.draw(st.integers(1, len(true)))
            emit(data.draw(st.permutations(true))[:k])
        elif op == "split":
            parent = data.draw(st.sampled_from(true))
            lo = parent.start[0] if parent.start else 0
            hi = parent.end[0] if parent.end else 256
            if hi - lo < 2:
                continue  # one-byte-wide shard: nothing to split
            cut = data.draw(st.integers(lo + 1, hi - 1))
            left = ShardRange(parent.start, bytes([cut]))
            right = ShardRange(bytes([cut]), parent.end)
            true = sorted([r for r in true if r != parent] + [left, right])
            pc = counters[parent.name]
            counters[left.name] = counters[right.name] = pc
            first, second = data.draw(st.permutations([left, right]))
            emit([first])  # partial visibility: sibling quiet
            assert (KS, first.name) in state.pending
            assert parent.name in state.shards  # not adopted yet
            if data.draw(st.booleans()):
                emit([first])  # sibling quiet for another batch
            emit([first, second])  # split completes
            assert state.shards == tuple(sorted(r.name for r in true))
            assert state.pending == ()
            assert state.vgtid.position(parent.name, KS) is None
        else:  # merge two adjacent shards
            if len(true) < 2:
                continue
            i = data.draw(st.integers(0, len(true) - 2))
            a, b = true[i], true[i + 1]
            merged = ShardRange(a.start, b.end)
            true = sorted([r for r in true if r not in (a, b)] + [merged])
            counters[merged.name] = max(counters[a.name], counters[b.name])
            emit([merged])
            assert state.shards == tuple(sorted(r.name for r in true))
            assert state.vgtid.position(a.name, KS) is None
            assert state.vgtid.position(b.name, KS) is None

    emit(true)  # quiesce: every serving shard speaks
    assert set(state.shards) == {r.name for r in true}
    assert {g.shard for g in state.vgtid.shard_gtids} == set(state.shards)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 254), st.integers(1, 20), st.booleans())
def test_stop_on_reshard_halts_at_committed_position(cut, n, full):
    """stopOnReshard HALT: the boundary batch is NOT processed, so the
    halted state's VGTID stays at the last COMMITTED position — a COMPLETE
    split maps children onto the parent's committed entry, a PARTIAL split
    keeps the parent entry and holds the seen child ``pending``; nothing
    from the boundary batch's own positions leaks in."""
    state, _ = advance_stream_state([row("-", "u1:1-%d" % n)],
                                    VitessStreamState())
    left = ShardRange(b"", bytes([cut]))
    right = ShardRange(bytes([cut]), b"")
    rows = [row("-", "u1:1-%d" % (n + 1)),
            row(left.name, "u1:1-%d" % (n + 2))]
    if full:
        rows.append(row(right.name, "u1:1-%d" % (n + 2)))
    st2, halt = advance_stream_state(rows, state, stop_on_reshard=True)
    assert halt and st2.stopped and st2.shards == ("-",)
    if full:
        # children resume from the parent's committed position (n, not
        # n+1 — the boundary batch re-delivers after restart)
        assert st2.vgtid.position(left.name, KS) == "u1:1-%d" % n
        assert st2.vgtid.position(right.name, KS) == "u1:1-%d" % n
        assert st2.vgtid.position("-", KS) is None
        assert st2.pending == ()
    else:
        assert st2.vgtid.position("-", KS) == "u1:1-%d" % n
        assert st2.vgtid.position(left.name, KS) is None
        assert st2.pending == ((KS, left.name),)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 254))
def test_first_contact_partial_then_late_discovery(cut):
    """A shard quiet in the first batch must not poison the stream: first
    contact adopts only the seen shards; the late shard is adopted as a
    discovery; an overlapping alien shard still raises."""
    import pytest

    left = ShardRange(b"", bytes([cut]))
    right = ShardRange(bytes([cut]), b"")
    state, _ = advance_stream_state([row(left.name, "u1:1")],
                                    VitessStreamState())
    assert state.shards == (left.name,)
    state, _ = advance_stream_state([row(right.name, "u2:1")], state)
    assert state.shards == tuple(sorted([left.name, right.name]))
    assert shards_tile(list(state.shards))
    # an alien shard overlapping the known set is still rejected
    if 2 <= cut <= 253:
        alien = ShardRange(bytes([cut - 1]), bytes([cut + 1]))
        with pytest.raises(ValueError, match="split or merge"):
            advance_stream_state([row(alien.name, "u3:1")], state)


def test_multi_keyspace_serving_sets_do_not_interfere():
    """Same shard names in two keyspaces: serving sets, reshards, and
    VGTID entries stay keyspace-scoped (a ks1 split must not touch ks2's
    '-80' entry or serving set)."""
    def krow(ks, shard, gtid):
        return {"shard": shard, "keyspace": ks,
                "vgtid": json.dumps([{"keyspace": ks, "shard": shard,
                                      "gtid": gtid}])}

    state = VitessStreamState()
    state, _ = advance_stream_state(
        [krow("ks1", "-80", "u1:1-5"), krow("ks1", "80-", "u2:1"),
         krow("ks2", "-80", "u3:1-9"), krow("ks2", "80-", "u4:1")], state)
    assert state.serving_map() == {"ks1": ("-80", "80-"),
                                   "ks2": ("-80", "80-")}
    # ks1 splits -80; ks2 steady
    state, halt = advance_stream_state(
        [krow("ks1", "-40", "u5:1"), krow("ks1", "40-80", "u6:1")], state)
    assert not halt
    assert state.serving_map()["ks1"] == ("-40", "40-80", "80-")
    assert state.serving_map()["ks2"] == ("-80", "80-")  # untouched
    assert state.vgtid.position("-80", "ks2") == "u3:1-9"  # not clobbered
    assert state.vgtid.position("-80", "ks1") is None      # retired
    assert state.vgtid.position("-40", "ks1") == "u5:1"
