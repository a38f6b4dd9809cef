"""URL canonicalization family: rule-by-rule literals, idempotence,
param-order invariance, DuckDB mirror parity, zero-exchange plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.urls import (
    canonicalize_urls,
    domain_caps,
    duckdb_domain_caps_sql,
    duckdb_url_canonical_sql,
    synth_urls,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    return [r.canonical_url for r in
            canonicalize_urls(df).orderBy("doc_id").collect()]


def _domains(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    return [r.registered_domain for r in
            canonicalize_urls(df).orderBy("doc_id").collect()]


class TestRules:
    def test_case_port_www_fragment_tracking(self, spark):
        got = _canon(spark, [
            "HTTP://WWW.Example.COM:80/a/b?utm_source=x&b=2&a=1#frag",
            "https://sub.Example.org:443/x?gclid=1&fbclid=2&ref=3",
            "http://h.net:8080/x?z=1",  # non-default port survives
            "https://plain.com/x",
        ])
        assert got == [
            "http://example.com/a/b?a=1&b=2",
            "https://sub.example.org/x",
            "http://h.net:8080/x?z=1",
            "https://plain.com/x",
        ]

    def test_param_order_invariance(self, spark):
        a, b = _canon(spark, [
            "http://s.com/p?b=2&a=1&utm_medium=m",
            "http://s.com/p?utm_medium=m&a=1&b=2",
        ])
        assert a == b

    def test_idempotent(self, spark):
        urls = [
            "HTTPS://WWW.site3.co.uk:443/p1/page2?id=9&utm_source=f#s",
            "http://x.com:8080/q?c=3&a=1",
        ]
        once = _canon(spark, urls)
        twice = _canon(spark, once)
        assert once == twice

    def test_registered_domain(self, spark):
        got = _domains(spark, [
            "http://a.b.example.co.uk/x",
            "http://www.example.com.au/x",
            "http://deep.sub.example.net/x",
            "http://example.org/x",
            "http://localhost/x",
        ])
        assert got == [
            "example.co.uk", "example.com.au", "example.net",
            "example.org", "localhost",
        ]


def test_mirror_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.registered_domain: (r.n_docs, r.n_canonical, r.n_tracking, r.sample_url)
        for r in canonicalize_urls(synth_urls(docs))
        .groupBy("registered_domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("canonical_url").cast("long").alias("n_canonical"),
            F.sum(
                (F.contains("url", F.lit("utm_"))
                 | F.contains("url", F.lit("fbclid="))).cast("long")
            ).alias("n_tracking"),
            F.min("canonical_url").alias("sample_url"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {r[0]: tuple(r[1:]) for r in
            con.execute(duckdb_url_canonical_sql("documents")).fetchall()}
    assert got == want


def test_domain_caps_mirror(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = canonicalize_urls(synth_urls(docs))
    got = {
        r.registered_domain: (r.n_docs, r.n_kept, r.min_kept_doc, r.max_kept_doc)
        for r in domain_caps(c, cap=3, blocklist_prefixes=("site13.",)).collect()
    }
    assert all(v[1] <= 3 for v in got.values())
    assert not any(d.startswith("site13.") for d in got)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {r[0]: tuple(r[1:]) for r in con.execute(
        duckdb_domain_caps_sql("documents", cap=3,
                               blocklist_prefixes=("site13.",))
    ).fetchall()}
    assert got == want


def test_canonicalize_plan_is_exchange_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        canonicalize_urls(synth_urls(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
