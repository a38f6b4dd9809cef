"""Key-skew profiler — operators/skew.py."""

from __future__ import annotations

import duckdb

from bloomfilter_multithread_spark.operators.skew import duckdb_skew_sql, skew_profile


def _fixture(spark):
    # 10_000 rows on one hot key + 100 rows on each of 90 cold keys
    rows = [("hot",)] * 10_000 + [(f"k{i:02d}",) for i in range(90) for _ in range(100)]
    return spark.createDataFrame(rows, "user_id string").repartition(8)


def test_hot_key_metrics(spark):
    prof = skew_profile(_fixture(spark), "user_id", top_k=5, n_buckets=32).collect()
    assert len(prof) == 5
    top = prof[0]
    assert top["key"] == "hot" and top["rank"] == 1
    assert top["n_rows"] == 19_000 and top["n_keys"] == 91
    # share 10000/19000 = 52.63% -> 5263 bp
    assert top["share_bp"] == 5263
    # max/mean = 10000 / (19000/91) -> 47894 bp, hugely skewed
    assert top["skew_ratio_bp"] == (10_000 * 10_000 * 91) // 19_000
    # the hot key alone overflows a fair bucket share (19000/32 ~ 594):
    # ceil(10000 * 32 / 19000) = 17 salts needed
    assert top["salt_hint"] == 17
    # every row carries the same corpus summary
    assert len({r["skew_ratio_bp"] for r in prof}) == 1


def test_uniform_keys_report_no_skew(spark):
    rows = [(f"k{i}",) for i in range(100) for _ in range(50)]
    df = spark.createDataFrame(rows, "user_id string")
    top = skew_profile(df, "user_id", top_k=3).collect()[0]
    assert top["skew_ratio_bp"] == 10_000  # max == mean
    assert top["salt_hint"] == 1  # no salting needed


def test_duckdb_mirror_hash_exact(spark):
    df = _fixture(spark)
    df.createOrReplaceTempView("_skewfix")
    got = sorted(
        tuple(r) for r in skew_profile(df, "user_id", top_k=7, n_buckets=16).collect()
    )
    con = duckdb.connect()
    pdf = df.toPandas()
    con.register("events_fix", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            duckdb_skew_sql("events_fix", "user_id", top_k=7, n_buckets=16)
        ).fetchall()
    )
    assert got == want


def test_tiebreak_is_deterministic(spark):
    # all keys equal -> ranking must be pure key order
    rows = [(f"k{i}",) for i in range(30) for _ in range(10)]
    df = spark.createDataFrame(rows, "user_id string")
    a = [r["key"] for r in skew_profile(df, "user_id", top_k=10).collect()]
    b = [r["key"] for r in skew_profile(df.repartition(13), "user_id", top_k=10).collect()]
    assert a == b == sorted(a)
