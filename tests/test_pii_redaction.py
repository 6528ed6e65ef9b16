"""redact_pii: sequential-count semantics + hypothesis fuzz vs DuckDB.

The scrub contract: patterns apply in order (email, URL, IPv4, phone) and
each count is taken on the string its own replacement consumes, so every
count equals the placeholders that step emitted.  The fuzz test replays
the identical scrub in DuckDB (RE2) and compares byte-for-byte — proof
the patterns live in the Java-regex/RE2-common subset.
"""

import duckdb
from hypothesis import given, settings, strategies as st

from source_flink_cdc_3_5_0_spark.extensions.text import (
    PII_PATTERNS,
    redact_pii,
)


def _duck_scrub(texts):
    """Replay the sequential scrub in DuckDB; returns rows of
    (n_emails, n_urls, n_ipv4, n_phones, redacted)."""
    con = duckdb.connect()
    stage = "t0"
    selects = []
    for name, pattern, tok in PII_PATTERNS:
        p = pattern.replace("'", "''")
        selects.append(
            f"CAST(len(regexp_extract_all({stage}, '{p}')) AS INTEGER) AS {name}")
        nxt = f"t{len(selects)}"
        selects.append(
            f"regexp_replace({stage}, '{p}', '{tok}', 'g') AS {nxt}")
        stage = nxt
    # build nested selects so each stage references the previous
    sql = "SELECT i, t0 FROM (SELECT unnest(range(len(?::VARCHAR[]))) AS i, unnest(?::VARCHAR[]) AS t0)"
    q = f"SELECT i, {', '.join(selects)} FROM ({sql})"
    rows = con.execute(q, [texts, texts]).fetchall()
    con.close()
    out = {}
    for r in rows:
        # r = (i, n_emails, t1, n_urls, t2, n_ipv4, t3, n_phones, t4)
        out[r[0]] = (r[1], r[3], r[5], r[7], r[8])
    return out


PII_FRAGMENTS = [
    "alice@example.com",
    "bob.smith+tag@mail.co.uk",
    "https://example.com/path?q=1&x=2",
    "http://10.1.2.3/admin",
    "visit example.com today",
    "1.2.3.4",
    "999.999.999.999",
    "10.0.0.",
    "+1 555 010 9999",
    "+44 (20) 7946-0958",
    "+--",
    "not@",
    "a@b.c",
    "ftp://ignored",
    "v1.2.3",
    "x@y@z.org",
    "tel+1234567890x",
]


def test_sequential_counts_match_placeholders(spark):
    """An email inside a URL is consumed by the email step; the URL count
    sees the already-scrubbed string. Every count equals the number of
    placeholders its step emitted."""
    rows = (
        redact_pii(spark.createDataFrame(
            [("mail https://x.com/a@b.com page",),
             ("ip http://1.2.3.4/x and bare 5.6.7.8",),
             ("call +1 555 010 1234 or write a@b.co",)],
            "text string"))
        .orderBy("text").collect())
    by_text = {r["text"]: r for r in rows}
    r1 = by_text["mail https://x.com/a@b.com page"]
    # email step consumed 'x.com/a@b.com'-ish match; its count is 1 and the
    # URL count reflects the POST-email string (placeholder breaks the URL)
    assert r1["n_emails"] == 1
    assert r1["n_urls"] == r1["redacted"].count("<URL>")
    r2 = by_text["ip http://1.2.3.4/x and bare 5.6.7.8"]
    assert r2["n_urls"] == 1          # URL step swallowed the first IP
    assert r2["n_ipv4"] == 1          # only the bare IP remains
    assert r2["redacted"].count("<IP>") == 1
    r3 = by_text["call +1 555 010 1234 or write a@b.co"]
    assert r3["n_phones"] == 1 and r3["n_emails"] == 1
    for r in rows:  # no fixture contains literal placeholder tokens
        assert r["n_emails"] == r["redacted"].count("<EMAIL>")
        assert r["n_urls"] == r["redacted"].count("<URL>")
        assert r["n_ipv4"] == r["redacted"].count("<IP>")
        assert r["n_phones"] == r["redacted"].count("<PHONE>")


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.one_of(
        st.sampled_from(PII_FRAGMENTS),
        st.text(alphabet="aZ09@.:/+()- _%?&=~#", max_size=12),
    ),
    min_size=1, max_size=6).map(" ".join))
def test_fuzz_scrub_matches_duckdb(spark, text):
    rows = (redact_pii(spark.createDataFrame([(text,)], "text string"))
            .collect())
    got = rows[0]
    want = _duck_scrub([text])[0]
    assert (got["n_emails"], got["n_urls"], got["n_ipv4"], got["n_phones"],
            got["redacted"]) == want, text
