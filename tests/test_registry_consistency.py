"""Registry/bench/docs drift gate (round-4 verdict item 9): the QUERIES
dict is the single source of truth — every oracle, every benched name, and
the driver-sample ordering contract are asserted against it so a rename or
an added query that forgets one of the three surfaces fails CI instead of
silently shipping a dangling name."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import bench_scale
from source_flink_cdc_3_5_0_spark import entry_queries as EQ


def test_every_oracle_targets_a_registered_query():
    dangling = set(EQ.ORACLES) - set(EQ.QUERIES)
    assert not dangling, f"ORACLES without a QUERIES entry: {sorted(dangling)}"


def test_every_query_has_an_oracle_or_is_documented_rows_only():
    # Desired state (round-3): zero rows-only queries. If one is ever
    # added deliberately (non-SQL-expressible op), list it here.
    allowed_rows_only: set[str] = set()
    rows_only = set(EQ.QUERIES) - set(EQ.ORACLES)
    assert rows_only <= allowed_rows_only, (
        f"queries without a DuckDB oracle: {sorted(rows_only)}")


def test_bench_names_exist_in_registry():
    missing = [q for q in bench.BENCH_QUERIES if q not in EQ.QUERIES]
    assert not missing, f"bench.py times unknown queries: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES), \
        "duplicate names in BENCH_QUERIES"


def test_headline_subset_of_bench():
    stray = [q for q in bench.HEADLINE_QUERIES
             if q not in bench.BENCH_QUERIES]
    assert not stray, f"HEADLINE_QUERIES not timed by bench: {stray}"


def test_headline_summary_line_fits_tail_capture():
    """The driver captures the LAST 2000 chars of bench stdout; the
    printed summary must always fit (round-4 lesson: parsed=null)."""
    import json

    fake = {q: 99.999 for q in bench.BENCH_QUERIES}
    out = {
        "metric": "bench_total",
        "value": round(sum(fake.values()), 3),
        "unit": "sec",
        "queries": {q: fake[q] for q in bench.HEADLINE_QUERIES},
        "sf": 0.1,
        "n_timed": len(fake),
        "full": "BENCH_FULL.json",
        "run_id": "20990101T235959Z-1234567",
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1900, f"summary line {len(line)} chars > 1900"


def test_every_query_timed_or_exclusion_documented():
    """Round-6 (verdict r5 item 4): a registry query either has a bench
    trend line or a one-line documented exclusion — never silently
    untimed."""
    timed = set(bench.BENCH_QUERIES)
    excluded = set(bench.EXCLUDED_QUERIES)
    overlap = timed & excluded
    assert not overlap, f"both timed and excluded: {sorted(overlap)}"
    missing = set(EQ.QUERIES) - timed - excluded
    assert not missing, (
        f"registry queries neither timed nor documented-excluded: "
        f"{sorted(missing)}")
    stale = excluded - set(EQ.QUERIES)
    assert not stale, f"EXCLUDED_QUERIES names unknown queries: {sorted(stale)}"
    for name, reason in bench.EXCLUDED_QUERIES.items():
        assert reason.strip(), f"empty exclusion reason for {name}"


def test_bench_scale_names_exist_in_registry():
    missing = [q for q in bench_scale.SCALE_QUERIES if q not in EQ.QUERIES]
    assert not missing, f"bench_scale.py uses unknown queries: {missing}"


def test_driver_sample_prefix_has_weakest_evidence_first():
    """The driver checks the FIRST 50 registry entries each round.
    Round-7 contract (verdict r6 item 4): the dict is ordered by OLDEST
    last-green driver round first — never-checked queries lead, then
    ascending last-green round — so every round's sample re-validates
    the stalest evidence.

    Round-9 fix (verdict r8 item 1): the derivation is scoped to
    correctness records with round <= QUERIES_ORDER_DERIVED_FROM_ROUND
    (stamped next to the literal). Previously this test globbed ALL
    records including the driver's fresh UNTRACKED one, so the suite
    was red at judge time every round by construction. A new query or
    a re-derive (which must bump the stamp) still forces the literal
    to be regenerated."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd > EQ.QUERIES_ORDER_DERIVED_FROM_ROUND:
            continue
        with open(path) as f:
            for k, v in json.load(f).items():
                if v.get("rows_match") and v.get("err") is None \
                        and v.get("hash_match", True) \
                        and v.get("schema_match", True):
                    last[k] = max(last.get(k, 0), rnd)
    names = list(EQ.QUERIES)
    rounds = [last.get(n, -1) for n in names]
    assert rounds == sorted(rounds), (
        "QUERIES is not ordered by oldest last-green round first; "
        "re-derive the literal from CORRECTNESS_r*.json — first "
        "out-of-order entry: %s" % next(
            (names[i] for i in range(1, len(rounds))
             if rounds[i] < rounds[i - 1]), None))
    uncovered = [n for n in names if n not in last]
    stray = [n for n in uncovered if n not in set(names[:50])]
    assert not stray, (
        f"queries without driver evidence outside the first-50 sample "
        f"window: {stray}")


def test_bench_guard_refuses_to_clobber_adjudicated_record(tmp_path,
                                                           monkeypatch):
    """Verdict r9 'what's wrong #2': a retimes-bearing BENCH_FULL must
    not be silently replaced by a retimes-free run — the snapshot path
    did exactly that and orphaned PERFORMANCE.md."""
    import json

    import pytest

    monkeypatch.delenv("SPARK_GRAFT_BENCH_CLOBBER", raising=False)
    p = tmp_path / "BENCH_FULL.json"
    p.write_text(json.dumps(
        {"run_id": "adjudicated", "retimes": {"q1": {"min": 1.0}}}))
    with pytest.raises(SystemExit, match="adjudicated retimes"):
        bench.guard_retimed_record(str(p), {"run_id": "bare"})
    # a new record that itself carries retimes may replace it
    bench.guard_retimed_record(
        str(p), {"run_id": "new", "retimes": {"q1": {"min": 1.0}}})
    # a bare prior record may be replaced freely
    p.write_text(json.dumps({"run_id": "bare-prev"}))
    bench.guard_retimed_record(str(p), {"run_id": "bare"})
    # missing / unparseable prior: no refusal
    bench.guard_retimed_record(str(tmp_path / "absent.json"), {})
    # deliberate override
    p.write_text(json.dumps(
        {"run_id": "adjudicated", "retimes": {"q1": {"min": 1.0}}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CLOBBER", "1")
    bench.guard_retimed_record(str(p), {"run_id": "bare"})


def test_bare_bench_redirects_instead_of_refusing(tmp_path, monkeypatch):
    """Verdict r10 'what's wrong #1': the guard refused a bare
    `python bench.py` — the exact invocation the driver makes — so the
    round had no bench record at all. The run must never be refused on
    the default path: an adjudicated BENCH_FULL redirects the fresh run
    to BENCH_LATEST.json (record survives, numbers still land); only an
    EXPLICITLY named adjudicated target refuses."""
    import json

    import pytest

    monkeypatch.delenv("SPARK_GRAFT_BENCH_CLOBBER", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    full = tmp_path / "BENCH_FULL.json"
    adjudicated = {"run_id": "adjudicated", "retimes": {"q1": {"min": 1.0}}}
    full.write_text(json.dumps(adjudicated))

    # bare invocation: rc-0 path — redirected beside the record
    out = bench.resolve_bench_output(["bench.py"], {},
                                     default_dir=str(tmp_path))
    assert out == str(tmp_path / "BENCH_LATEST.json")
    assert json.loads(full.read_text()) == adjudicated  # untouched

    # bare invocation over a NON-adjudicated record: write in place
    full.write_text(json.dumps({"run_id": "plain"}))
    assert bench.resolve_bench_output(["bench.py"], {},
                                      default_dir=str(tmp_path)) == str(full)

    # explicit path at an adjudicated record: refuse up-front
    full.write_text(json.dumps(adjudicated))
    with pytest.raises(SystemExit, match="adjudicated retimes"):
        bench.resolve_bench_output(["bench.py", str(full)], {})
    with pytest.raises(SystemExit, match="adjudicated retimes"):
        bench.resolve_bench_output(
            ["bench.py"], {"SPARK_GRAFT_BENCH_OUT": str(full)})
    # explicit path elsewhere: honored verbatim
    other = tmp_path / "BENCH_r11_probe.json"
    assert bench.resolve_bench_output(
        ["bench.py", str(other)], {}) == str(other)

    # deliberate clobber override wins everywhere
    env = {"SPARK_GRAFT_BENCH_CLOBBER": "1"}
    assert bench.resolve_bench_output(
        ["bench.py"], env, default_dir=str(tmp_path)) == str(full)
    assert bench.resolve_bench_output(["bench.py", str(full)], env) == str(full)

    # end-of-round snapshot simulation (verdict r10 item 6): a full
    # bare-run cycle — resolve, write the fresh record at the resolved
    # path — leaves the adjudicated record byte-identical on disk
    resolved = bench.resolve_bench_output(["bench.py"], {},
                                          default_dir=str(tmp_path))
    fresh = {"run_id": "fresh-driver-run", "metric": "bench_total"}
    bench.guard_retimed_record(resolved, fresh)  # belt-and-braces passes
    with open(resolved, "w") as f:
        json.dump(fresh, f)
    assert json.loads(full.read_text()) == adjudicated
    assert json.loads(
        (tmp_path / "BENCH_LATEST.json").read_text()) == fresh


def test_bare_bench_redirects_when_HEAD_record_is_adjudicated(tmp_path,
                                                              monkeypatch):
    """Verdict r11 'what's wrong #1' (the r9 clobber repeating): once a
    noisy bare run lands on BENCH_FULL the on-disk record is bare and
    later bare runs overwrite freely — the COMMITTED adjudication must
    keep redirecting bare runs even then."""
    import json
    import subprocess

    monkeypatch.delenv("SPARK_GRAFT_BENCH_CLOBBER", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    subprocess.run(["git", "init", "-q", str(tmp_path)], check=True)
    full = tmp_path / "BENCH_FULL.json"
    adjudicated = {"run_id": "adj", "retimes": {"q1": {"min": 1.0}}}
    full.write_text(json.dumps(adjudicated))
    subprocess.run(["git", "-C", str(tmp_path), "add", "-A"], check=True)
    subprocess.run(["git", "-C", str(tmp_path), "-c", "user.email=t@t",
                    "-c", "user.name=t", "commit", "-qm", "adj"],
                   check=True)
    # the clobber: a bare (retimes-free) record now sits in the tree
    full.write_text(json.dumps({"run_id": "noisy-bare"}))
    out = bench.resolve_bench_output(["bench.py"], {},
                                     default_dir=str(tmp_path))
    assert out == str(tmp_path / "BENCH_LATEST.json")
    # an EXPLICIT target is still honored (the caller named it)
    assert bench.resolve_bench_output(
        ["bench.py", str(full)], {}) == str(full)
    # untracked dir: no git protection, bare-over-bare writes in place
    other = tmp_path / "sub"
    other.mkdir()
    (other / "BENCH_FULL.json").write_text(json.dumps({"run_id": "x"}))
    assert bench.resolve_bench_output(
        ["bench.py"], {}, default_dir=str(other)) == \
        str(other / "BENCH_FULL.json")


def test_steal_redirect_keeps_noisy_runs_off_the_reference(tmp_path):
    """r12: a retimes-free run whose own noise stamp shows >2% steal
    lands in BENCH_LATEST.json, never as the default record."""
    full = str(tmp_path / "BENCH_FULL.json")
    latest = str(tmp_path / "BENCH_LATEST.json")
    noisy = {"host_noise": {"steal_pct": 5.66}}
    clean = {"host_noise": {"steal_pct": 0.3}}
    assert bench.steal_redirect(full, noisy, {}) == latest
    assert bench.steal_redirect(full, clean, {}) == full
    # adjudicated runs and explicit targets pass through
    assert bench.steal_redirect(
        full, {"retimes": {"q": 1}, "host_noise": {"steal_pct": 9.0}},
        {}) == full
    other = str(tmp_path / "BENCH_r12_probe.json")
    assert bench.steal_redirect(other, noisy, {}) == other
    # threshold is env-tunable
    assert bench.steal_redirect(
        full, noisy, {"SPARK_GRAFT_BENCH_MAX_STEAL": "10"}) == full
    # missing stamp: benefit of the doubt (never block measurement)
    assert bench.steal_redirect(full, {}, {}) == full
