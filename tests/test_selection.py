"""Data-selection family: hashed classifier, DSIR, token entropy, and
the ExactSubstr duplicated-span operator — unit semantics + plan-shape
assertions (the value-level DuckDB parity for all four is covered by
tests/test_entry_contract.py, which runs every contract query against
its oracle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.selection import (
    dsir_weights,
    hashed_classifier_scores,
    seeded_weights,
    token_entropy,
)
from bloomfilter_multithread_spark.operators.substring import dup_span_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    return df


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------

def test_entropy_zero_for_constant_doc(spark):
    df = spark.createDataFrame(
        [(1, "a a a a a"), (2, "a b c d e")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in token_entropy(df).collect()}
    assert rows[1].entropy_micro == 0  # one symbol -> H = 0 exactly
    assert rows[1].n_distinct == 1
    # uniform over 5 symbols -> H = log2(5); fixed-point form is within
    # 1 micro of the closed form (n=1 terms are exactly 0)
    assert abs(rows[2].entropy_micro - round(math.log2(5) * 1e6)) <= 1
    assert rows[2].n_distinct == 5


def test_entropy_bounds_and_plan(docs):
    out = token_entropy(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole operator is ONE narrow projection — zero exchanges
    assert "Exchange" not in plan
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        # 0 <= H <= log2(n_distinct) (+1 micro rounding slack)
        assert -1 <= r.entropy_micro <= math.log2(max(r.n_distinct, 2)) * 1e6 + 1
        assert r.n_distinct <= r.n_tokens


# ---------------------------------------------------------------------------
# hashed classifier
# ---------------------------------------------------------------------------

def test_classifier_is_linear_in_tokens(spark):
    """score(doc1 ++ doc2) == score(doc1) + score(doc2) — the defining
    property of a bag-of-words linear model."""
    w = seeded_weights(spark)
    a, b = "alpha beta gamma", "delta epsilon"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, a + " " + b)], "doc_id long, text string"
    )
    s = {r.doc_id: r.score for r in hashed_classifier_scores(df, w).collect()}
    assert s[3] == s[1] + s[2]


def test_classifier_broadcasts_weight_table(docs, spark):
    out = hashed_classifier_scores(docs, seeded_weights(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fixed-size bucket table broadcast
    # the only non-broadcast exchange is the final groupBy(doc) — no
    # shuffle join on the weight side
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    keep = out.agg(F.avg(F.col("keep").cast("int"))).first()[0]
    assert 0.0 < keep < 1.0  # seeded weights split the corpus, not degenerate


def test_classifier_pluggable_weights(spark):
    """Any (bucket, weight) frame plugs in — all-positive weights must
    keep everything."""
    ones = spark.range(4096).select(
        F.col("id").alias("bucket"), F.lit(1).cast("long").alias("weight")
    )
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    r = hashed_classifier_scores(df, ones).first()
    assert r.score == r.n_tokens == 3 and bool(r.keep)


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def test_dsir_selects_exact_fraction_and_favors_target(docs):
    out = dsir_weights(docs, "lang = 'en'").cache()
    n = docs.count()
    sel = out.where("selected")
    assert sel.count() == int(0.25 * n)
    # docs FROM the target slice should have higher mean importance than
    # the rest (the whole point of importance resampling)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = dict(
        joined.groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_micro"))
        .collect()
    )
    assert means[True] > means[False]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan  # global_rank, not a window
    out.unpersist()


def test_dsir_weight_is_sum_of_feature_logratios(spark):
    """Two copies of the same text get identical weights; a doc that is
    the concatenation has weight >= fragments' (uni/bi features add,
    plus the junction bigram)."""
    df = spark.createDataFrame(
        [(1, "p q r", True), (2, "p q r", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {r.doc_id: r.dsir_micro for r in dsir_weights(df, "tgt").collect()}
    assert out[1] == out[2]  # weight depends on content only, not the slice


# ---------------------------------------------------------------------------
# dup_span_stats
# ---------------------------------------------------------------------------

def test_dup_spans_crafted_geometry(spark):
    """Two docs share a 12-token run -> one merged island of 12 tokens
    each (k=10 grams at starts 0,1,2 merge); a clean doc has none; a
    short doc (<k tokens) has no grams and keeps 10000 bp."""
    shared = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 tail2 tail3"),
            (2, "head1 head2 " + shared),
            (3, " ".join(f"solo{i}" for i in range(20))),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dup_span_stats(df, k=10).collect()}
    assert rows[1].n_dup_spans == 1 and rows[1].n_covered_tokens == 12
    assert rows[2].n_dup_spans == 1 and rows[2].n_covered_tokens == 12
    assert rows[3].n_dup_spans == 0 and rows[3].keep_frac_bp == 10000
    assert rows[4].n_tokens == 2 and rows[4].keep_frac_bp == 10000
    assert rows[1].keep_frac_bp == (16 - 12) * 10000 // 16


def test_dup_spans_within_doc_repeat_counts(spark):
    """Lee et al. dedup within-doc repeats too: a doc repeating its own
    10-gram is covered even though no other doc shares it."""
    block = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, block + " mid " + block)], "doc_id long, text string"
    )
    r = dup_span_stats(df, k=10).first()
    assert r.n_dup_spans == 2 and r.n_covered_tokens == 20


def test_dup_spans_digest_before_exchange(docs):
    """No gram text crosses a shuffle: every Exchange input carries the
    md5 digest column, never the raw gram string."""
    out = dup_span_stats(docs, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_g" not in line  # the gram column never reaches a shuffle
