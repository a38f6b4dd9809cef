"""PII scrubbing (operators/pii.py) — match semantics, cross-engine
pattern parity, and the zero-shuffle plan guarantee."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.pii import (
    PII_SPECS,
    duckdb_pii_exprs,
    redacted,
    with_pii_counts,
)

ROWS = [
    (1, "reach me at alice.smith+spam@mail.example.org today"),
    (2, "server 192.168.10.254 then 10.0.0.1 rebooted"),
    (3, "call +1-202-555-0143 or +44-207-555-0100 now"),
    (4, "plain text with no identifiers at all"),
    (5, "mixed bob@corp.io from 172.16.5.9 call +1-303-555-0177"),
    (6, ""),
    (7, "not-an-email @ nor an ip 1.2.3 nor a phone +1-20-55"),
]
EXPECTED = {
    1: (1, 0, 0),
    2: (0, 0, 2),
    3: (0, 2, 0),
    4: (0, 0, 0),
    5: (1, 1, 1),
    6: (0, 0, 0),
    7: (0, 0, 0),
}


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_counts(spark, pii_df):
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"])
        for r in with_pii_counts(pii_df).collect()
    }
    assert got == EXPECTED


def test_redaction_removes_all_matches(spark, pii_df):
    # scrubbing the scrubbed text is the identity (fixed point) and the
    # scrubbed text has zero residual matches
    once = pii_df.select("doc_id", redacted("text").alias("text"))
    counts = with_pii_counts(once).collect()
    for r in counts:
        assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (0, 0, 0), r
    twice = once.select("doc_id", redacted("text").alias("text"))
    assert sorted(once.collect()) == sorted(twice.collect())


def test_clean_text_untouched(spark, pii_df):
    rows = pii_df.where("doc_id in (4, 6, 7)").select(
        "text", redacted("text").alias("red")
    ).collect()
    for r in rows:
        assert r["text"] == r["red"]


def test_duckdb_parity(spark, pii_df):
    """Same counts AND bit-identical redacted text in DuckDB (RE2) —
    the cross-engine guarantee the contract oracle depends on."""
    con = duckdb.connect()
    con.register("t", pii_df.toPandas())
    counts, red = duckdb_pii_exprs("text")
    odf = con.sql(
        f"SELECT doc_id, {', '.join(counts)}, {red} AS red FROM t ORDER BY doc_id"
    ).df()
    sdf = (
        with_pii_counts(pii_df)
        .select("doc_id", *[f"n_{n}" for n, _, _ in PII_SPECS],
                redacted("text").alias("red"))
        .orderBy("doc_id")
        .toPandas()
    )
    for col in sdf.columns:
        assert list(sdf[col]) == list(odf[col]), col


def test_zero_shuffle_plan(spark, pii_df):
    """The scrub is a pure narrow map — no Exchange in the plan."""
    plan = (
        with_pii_counts(pii_df)
        .withColumn("red", redacted("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_dupngram_bruteforce(spark):
    """dup_ngram_stats equals a driver-side brute-force on a corpus with
    known shared 5-grams."""
    from bloomfilter_multithread_spark.operators.dedup import dup_ngram_stats

    docs = [
        (1, "a b c d e f g"),        # grams: abcde bcdef cdefg
        (2, "a b c d e x y"),        # shares abcde with doc 1
        (3, "p q r s t u"),          # unique
        (4, "short"),                # < k tokens -> whole text
        (5, "short"),                # exact dup of 4 at whole-text level
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"], r["dup_bp"])
           for r in dup_ngram_stats(df, k=5).collect()}
    assert got[1] == (3, 1, 3333)
    assert got[2] == (3, 1, 3333)
    assert got[3] == (2, 0, 0)
    assert got[4] == (1, 1, 10000)
    assert got[5] == (1, 1, 10000)


def test_dupngram_partition_invariance(spark):
    """Same stats regardless of input partitioning (hash-key shuffles
    only — no ordering assumptions)."""
    from bloomfilter_multithread_spark.operators.dedup import dup_ngram_stats

    docs = [(i, f"w{i % 3} x y z q r s t") for i in range(40)]
    df1 = spark.createDataFrame(docs, "doc_id int, text string").repartition(1)
    df8 = spark.createDataFrame(docs, "doc_id int, text string").repartition(8)
    a = sorted(map(tuple, dup_ngram_stats(df1, k=5).collect()))
    b = sorted(map(tuple, dup_ngram_stats(df8, k=5).collect()))
    assert a == b
