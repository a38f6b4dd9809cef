"""Group-aware splitting: leakage guarantee, determinism under
repartitioning, spec validation, DuckDB mirror parity, plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.splits import (
    DEFAULT_SPLITS,
    duckdb_group_split_case,
    group_split,
)
from bloomfilter_multithread_spark.operators.urls import (
    canonicalize_urls,
    synth_urls,
)


def _assigned(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return group_split(
        canonicalize_urls(synth_urls(docs, keep=("lang", "n_chars"))),
        "registered_domain",
    )


def test_no_group_straddles_splits(spark, sf_dir):
    leaky = (
        _assigned(spark, sf_dir)
        .groupBy("registered_domain")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert leaky == 0


def test_partitioning_invariance(spark, sf_dir):
    a = {(r.doc_id, r.split) for r in
         _assigned(spark, sf_dir).select("doc_id", "split").collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    b = {(r.doc_id, r.split) for r in
         group_split(canonicalize_urls(synth_urls(docs)), "registered_domain")
         .select("doc_id", "split").collect()}
    assert a == b


def test_domain_shares_roughly_match_weights(spark, sf_dir):
    shares = {
        r.split: r.n
        for r in _assigned(spark, sf_dir)
        .select("registered_domain", "split").distinct()
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(shares.values())
    assert set(shares) == {"train", "val", "test"}
    # 80/10/10 by domain; small-corpus tolerance
    assert 0.65 <= shares["train"] / total <= 0.92


def test_seed_changes_assignment(spark, sf_dir):
    base = _assigned(spark, sf_dir).select("doc_id", "split")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    other = group_split(
        canonicalize_urls(synth_urls(docs)), "registered_domain", seed="s2"
    ).select("doc_id", "split")
    diff = base.join(other.withColumnRenamed("split", "split2"), "doc_id").where(
        F.col("split") != F.col("split2")
    )
    assert diff.count() > 0


@pytest.mark.parametrize("bad", [
    (("train", 1_000_000),),                       # <2 splits
    (("a", 500_000), ("b", 400_000)),              # doesn't sum
    (("a", 500_000), ("a", 500_000)),              # dup name
    (("a", 1_000_000), ("b", 0)),                  # zero weight
])
def test_bad_specs_rejected(spark, bad):
    df = spark.range(1).withColumnRenamed("id", "g")
    with pytest.raises(ValueError):
        group_split(df, "g", splits=bad)


def test_mirror_parity(spark, sf_dir):
    got = {
        (r.split, r.lang): (r.n_docs, r.n_domains, r.sum_chars)
        for r in _assigned(spark, sf_dir)
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("registered_domain").cast("long").alias("n_domains"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .collect()
    }
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {(r[0], r[1]): tuple(r[2:]) for r in
            con.execute(entrymod._group_split_oracle_sql()).fetchall()}
    assert got == want


def test_assignment_plan_is_exchange_free(spark, sf_dir):
    plan = _assigned(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_duckdb_case_matches_spark_bucketing(spark):
    # the CASE text itself, evaluated by DuckDB over raw values, agrees
    # with the Spark column on the same values
    vals = [f"dom{i}.com" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "g string")
    got = {r.g: r.split for r in group_split(df, "g").collect()}
    con = duckdb.connect()
    case = duckdb_group_split_case("g")
    want = {v: con.execute(f"SELECT {case} FROM (SELECT '{v}' AS g)").fetchone()[0]
            for v in vals}
    assert got == want
    assert len(set(got.values())) == 3


# ----------------------------------------------------------- split_leakage

def _leak_fixture(spark):
    from bloomfilter_multithread_spark.operators.splits import split_leakage

    assignment = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "test"), (5, "train")],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 9000), (1, 3, 8500), (4, 5, 9900)],
        "id_a long, id_b long, jaccard_bp long",
    )
    return split_leakage(pairs, assignment), assignment, pairs


def test_split_leakage_flags_only_cross_split_pairs(spark):
    out, _, _ = _leak_fixture(spark)
    got = {(r.id_a, r.id_b, r.jaccard_bp, r.split_a, r.split_b)
           for r in out.collect()}
    assert got == {
        (1, 2, 9000, "train", "val"),   # crosses train/val
        (4, 5, 9900, "test", "train"),  # crosses test/train
    }  # (1,3) is train/train -> not leakage


def test_split_leakage_plan_never_shuffles_the_corpus(spark):
    out, _, _ = _leak_fixture(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every join is broadcast: pair ids semi-join + two split attaches
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
