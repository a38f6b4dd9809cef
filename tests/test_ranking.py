"""global_rank / global_ntile — distributed order statistics.

Ground truth is Spark's own single-partition window (row_number / ntile
with no partitionBy), which is exactly the plan shape the operator
exists to avoid; the plan assertion pins that avoidance.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bloomfilter_multithread_spark.operators.ranking import global_rank, global_ntile


@pytest.fixture(scope="module")
def df(spark):
    # values with heavy ties; unique id as tiebreak
    rows = [(i, (i * 7) % 13) for i in range(997)]
    d = spark.createDataFrame(rows, "id long, v long").repartition(8).cache()
    d.count()
    return d


def test_rank_matches_single_partition_window(df):
    got = {r["id"]: r["rank"] for r in global_rank(df, ["v", "id"]).collect()}
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rk"] - 1
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_rank_is_permutation_and_deterministic(df):
    a = sorted(r["rank"] for r in global_rank(df, ["v", "id"]).collect())
    assert a == list(range(997))
    one = {r["id"]: r["rank"] for r in global_rank(df, ["v", "id"]).collect()}
    two = {r["id"]: r["rank"] for r in global_rank(df, ["v", "id"]).collect()}
    assert one == two


@pytest.mark.parametrize("n", [1, 2, 3, 7, 997, 2000])
def test_ntile_matches_spark_ntile(df, n):
    got = {r["id"]: r["bucket"] for r in global_ntile(df, n, ["v", "id"]).collect()}
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["nt"] for r in df.withColumn("nt", F.ntile(n).over(w)).collect()
    }
    assert got == want


def test_no_single_partition_exchange(df):
    plan = global_rank(df, ["v", "id"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the trap this operator replaces DOES plan one — keep the contrast pinned
    trap = (
        df.withColumn("rk", F.row_number().over(Window.orderBy("v", "id")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" in trap


def test_empty_and_tiny_inputs(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert global_rank(empty, ["v", "id"]).count() == 0
    two = spark.createDataFrame([(1, 5), (2, 4)], "id long, v long")
    got = {r["id"]: r["bucket"] for r in global_ntile(two, 5, ["v", "id"]).collect()}
    assert got == {2: 1, 1: 2}  # N < n: row i -> bucket i+1 in order
