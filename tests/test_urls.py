"""URL canonicalization + per-domain quota (functions/urls.py,
operators/sampling.cap_per_group). Graded entries url_normalize /
cap_per_domain carry the oracle; these pin the contract edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from database2ogr_spark.functions import urls as U
from database2ogr_spark.operators.sampling import cap_per_group


def _norm(spark, raw: str):
    df = spark.createDataFrame([(raw,)], "url string")
    return df.select(U.normalize_url("url").alias("n")).collect()[0]["n"]


def test_normalize_url_rules(spark):
    cases = {
        # scheme+host lowercase, www stripped, default port dropped,
        # fragment dropped, tracking dropped, params sorted, trailing slash
        "HTTP://WWW.Ex.COM:80/A/b/?b=2&utm_source=x&a=1#f": "http://ex.com/A/b?a=1&b=2",
        # https default port; path case preserved
        "https://Ex.com:443/Path": "https://ex.com/Path",
        # non-default port kept; empty path -> /
        "http://ex.com:8080": "http://ex.com:8080/",
        # userinfo excluded from host
        "http://user:pw@ex.com/x": "http://ex.com/x",
        # only tracking params -> no query at all
        "http://ex.com/x?utm_medium=a&gclid=1&fbclid=2&ref=3": "http://ex.com/x",
        # root slash survives
        "http://ex.com/": "http://ex.com/",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw


def test_normalize_url_non_url_is_null(spark):
    assert _norm(spark, "not a url") is None
    assert _norm(spark, "") is None


def test_registered_domain(spark):
    cases = {
        "cdn.a.ex.com": "ex.com",
        "ex.com": "ex.com",
        "localhost": "localhost",
        "a.b.ex.co.uk": "ex.co.uk",
        "ex.co.uk": "ex.co.uk",
        "x.com.au": "x.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select("host", U.registered_domain("host").alias("d")).collect()
    }
    assert got == cases


def test_cap_per_group_quota_and_nesting(spark):
    rows = [(i, "big" if i < 80 else "small") for i in range(83)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept5 = cap_per_group(df, cap=5, group_col="domain")
    counts = {
        r["domain"]: r["count"]
        for r in kept5.groupBy("domain").count().collect()
    }
    assert counts == {"big": 5, "small": 3}  # small group under cap: all kept
    # nested quotas: cap=5 selection is a subset of cap=10's
    ids5 = {r["doc_id"] for r in kept5.collect()}
    ids10 = {r["doc_id"] for r in cap_per_group(df, cap=10, group_col="domain").collect()}
    assert ids5 <= ids10
    # deterministic across invocations
    assert ids5 == {r["doc_id"] for r in cap_per_group(df, cap=5, group_col="domain").collect()}
