"""URL canonicalization + host dedup (functions/urls.py,
operators/weburl.py): pinned canonicalization semantics, differential
parity with the DuckDB mirrors, and the dedup/profile invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.functions import urls as U
from etl_gardener_spark.operators import weburl as WB

# (input, canonical, host) — pins the rule set: case, default ports,
# userinfo, fragments, tracking params, separators, trailing slashes,
# non-URL pass-through, and the things deliberately NOT merged
# (non-default ports, real query params, scheme differences).
CASES = [
    ("https://WWW.Example.COM/p", "https://example.com/p", "example.com"),
    ("https://example.com:443/p", "https://example.com/p", "example.com"),
    ("http://example.com:80/p", "http://example.com/p", "example.com"),
    ("ftp://Host.Net:21/f", "ftp://host.net/f", "host.net"),
    ("http://example.com:8080/p", "http://example.com:8080/p", "example.com"),
    ("https://example.com/p/", "https://example.com/p", "example.com"),
    ("https://x.com/", "https://x.com", "x.com"),
    ("https://x.com/?utm_source=a", "https://x.com", "x.com"),
    (
        "https://x.com/p?utm_source=n&utm_medium=e",
        "https://x.com/p",
        "x.com",
    ),
    (
        "https://x.com/p?a=1&utm_campaign=x&fbclid=c9",
        "https://x.com/p?a=1",
        "x.com",
    ),
    ("https://x.com/p?utm_a=1&utm_b=2", "https://x.com/p", "x.com"),
    ("https://x.com/p?xref=1", "https://x.com/p?xref=1", "x.com"),
    ("https://x.com/p?ref_src=tw&b=2", "https://x.com/p?b=2", "x.com"),
    ("https://x.com/p#frag", "https://x.com/p", "x.com"),
    ("HTTPS://u:pw@x.com/p", "https://x.com/p", "x.com"),
    ("  https://Pad.Org/a  ", "https://pad.org/a", "pad.org"),
    ("not a url at all", "not a url at all", ""),
]


def test_canonical_url_pinned(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: (r["c"], r["h"])
        for r in df.select(
            "i",
            U.canonical_url("u").alias("c"),
            U.url_host("u").alias("h"),
        ).collect()
    }
    for i, (raw, canon, host) in enumerate(CASES):
        assert got[i] == (canon, host), f"case {raw!r}: {got[i]}"


def test_canonical_url_sql_mirror_bit_identical(spark):
    """The DuckDB rendering must produce byte-identical strings — the
    property the oracle hash match rests on."""
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: (r["c"], r["h"])
        for r in df.select(
            "i",
            U.canonical_url("u").alias("c"),
            U.url_host("u").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, u VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, c[0]) for i, c in enumerate(CASES)]
    )
    rows = con.execute(
        f"SELECT i, {U.canonical_url_sql('u')}, {U.url_host_sql('u')} FROM t"
    ).fetchall()
    for i, c, h in rows:
        assert got[i] == (c, h), f"engine divergence on {CASES[i][0]!r}"


def test_url_dedup_keep_min_and_counts(spark):
    rows = [
        (7, "https://A.com/x/"),
        (3, "https://a.com/x"),
        (9, "https://a.com/x?utm_source=s"),
        (5, "https://b.com/y"),
    ]
    out = {
        r["canonical_url"]: (r["keep_id"], r["n_docs"])
        for r in WB.url_dedup(
            spark.createDataFrame(rows, "doc_id long, u string"), "u", "doc_id"
        ).collect()
    }
    assert out == {
        "https://a.com/x": (3, 3),
        "https://b.com/y": (5, 1),
    }


def test_host_profile_invariants(spark):
    rows = [
        (1, "https://www.a.com/x/"),
        (2, "https://a.com/x"),
        (3, "https://a.com:443/y"),
        (4, "http://b.com/z#f"),
    ]
    out = {
        r["host"]: r.asDict()
        for r in WB.host_profile(
            spark.createDataFrame(rows, "doc_id long, u string"), "u", "doc_id"
        ).collect()
    }
    assert out["a.com"] == {
        "host": "a.com",
        "n_docs": 3,
        "n_urls": 2,
        "dup_count": 1,
    }
    assert out["b.com"]["n_docs"] == out["b.com"]["n_urls"] == 1
    for v in out.values():
        assert v["dup_count"] == v["n_docs"] - v["n_urls"] >= 0


@pytest.mark.parametrize(
    "name", ["doc_url_canonical_dedup", "doc_host_profile"]
)
def test_registered_queries_match_oracle(spark, duck, name):
    from tests.conftest import SF_DIR, assert_matches_oracle
    from etl_gardener_spark.plans import queries as Q

    spec = Q.REGISTRY[name]
    assert_matches_oracle(spec.fn(spark, SF_DIR), duck, spec.oracle)


def test_incremental_url_dedup_statuses(spark):
    """Store outranks batch; earlier batch doc outranks later; unique
    rows carry NULL dup_of — the incremental_minhash_dedup semantics
    on the canonical-URL key."""
    store_docs = spark.createDataFrame(
        [(2, "https://a.com/x"), (4, "https://b.com/y")],
        "doc_id long, u string",
    )
    store = WB.url_dedup(store_docs, "u", "doc_id")
    batch = spark.createDataFrame(
        [
            (5, "https://A.com/x/"),            # store dup (canonical a.com/x)
            (7, "https://c.com/z?utm_source=s"),  # batch-unique, first
            (9, "https://c.com/z"),              # dup of 7 in batch
            (11, "https://d.com/w"),             # unique
        ],
        "doc_id long, u string",
    )
    out = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in WB.incremental_url_dedup(batch, store, "u", "doc_id").collect()
    }
    assert out == {
        5: ("dup_of_store", 2),
        7: ("unique", None),
        9: ("dup_in_batch", 7),
        11: ("unique", None),
    }
