"""URL normalization expressions + web_hygiene_gate unit contracts
(the q181 certified path covers the composed gate over synthesized
URLs; these pin the edge cases the synthesis cannot reach)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_graph_etl_spark.functions.url import (
    normalize_url,
    url_domain,
    url_host,
)
from ontology_graph_etl_spark.operators.webops import web_hygiene_gate


def _one(spark, url):
    df = spark.createDataFrame([(url,)], "u string").select(
        url_host(F.col("u")).alias("h"),
        url_domain(F.col("u")).alias("d"),
        normalize_url(F.col("u")).alias("n"),
    )
    return df.collect()[0]


def test_url_expression_edge_cases(spark):
    # scheme + userinfo + port + utm filtering + fragment
    r = _one(
        spark,
        "HTTPS://user:pw@WWW.Ex.COM:8080/A/b?utm_s=1&q=2&utm_m=3#frag",
    )
    assert r.h == "www.ex.com"
    assert r.d == "ex.com"
    assert r.n == "www.ex.com:8080/A/b?q=2"
    # scheme-less input starts at the authority
    r = _one(spark, "Ex.COM/path")
    assert (r.h, r.d, r.n) == ("ex.com", "ex.com", "ex.com/path")
    # all params are tracking -> the '?' drops entirely
    r = _one(spark, "http://a.b/p?utm_a=1&utm_b=2")
    assert r.n == "a.b/p"
    # bare host, no path/query/fragment
    r = _one(spark, "https://A.B")
    assert (r.h, r.n) == ("a.b", "a.b")
    # '@' AFTER the authority (in path/query) is not userinfo
    r = _one(spark, "https://a.b/p?to=x@y.z")
    assert r.h == "a.b"
    assert r.n == "a.b/p?to=x@y.z"
    # www is kept in the dedup identity, stripped only in the domain
    r = _one(spark, "https://www.a.b/p")
    assert (r.d, r.n) == ("a.b", "www.a.b/p")
    # NULL propagates
    row = (
        spark.createDataFrame([(None,)], "u string")
        .select(url_host(F.col("u")).alias("h"))
        .collect()[0]
    )
    assert row.h is None


def test_web_hygiene_gate_defaults_and_blocked_shadow(spark):
    # no blocklist, no cap: keep == not url_dup; first-wins by id.
    # A BLOCKED row must not shadow a legitimate copy of its URL
    # (blocked rows are outside the dedup identity pool).
    rows = [
        (1, "https://a.com/x"),
        (2, "http://A.COM/x"),       # dup of 1 (scheme/case drop)
        (3, "https://bad.com/x"),    # blocked
        (4, "https://bad.com/x"),    # blocked too — not a dup
        (5, "https://b.com/x"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {
        r.id: r
        for r in web_hygiene_gate(df, "url", "id").collect()
    }
    assert not any(r.blocked for r in out.values())
    assert [out[i].url_dup for i in (1, 2, 3, 4, 5)] == [
        False, True, False, True, False
    ]
    assert all(out[i].keep == (not out[i].url_dup) for i in out)

    blocked = web_hygiene_gate(
        df, "url", "id", blocked_domains=["bad.com"]
    ).collect()
    by = {r.id: r for r in blocked}
    assert by[3].blocked and by[4].blocked
    # blocked rows: never dup, never ranked, never kept
    assert not by[3].url_dup and not by[4].url_dup
    assert by[3].domain_rank is None and not by[3].keep
    # cap over survivors only, deterministic by id
    capped = web_hygiene_gate(
        df, "url", "id", blocked_domains=["bad.com"], max_per_domain=1
    ).collect()
    byc = {r.id: r for r in capped}
    assert byc[1].keep and byc[5].keep
    assert not byc[2].keep  # dup
    # a DataFrame blocklist behaves like the list form
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    with_df = {
        r.id: r.blocked
        for r in web_hygiene_gate(
            df, "url", "id", blocked_domains=bl
        ).collect()
    }
    assert with_df == {1: False, 2: False, 3: True, 4: True, 5: False}
