"""Exponentially-decayed counts — closed-form values, mergeability,
epoch-floor parity (the oracle-value gate is tests/test_entry_contract.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.decay import (
    decayed_counts,
    duckdb_decayed_counts_sql,
)


def test_closed_form_halving(spark):
    """An event exactly one halflife old contributes half of a fresh one
    (500000 vs 1000000 micro); two halflives a quarter."""
    base = 1_700_000_000
    df = spark.createDataFrame(
        [("a", base), ("a", base - 86400), ("b", base - 2 * 86400)],
        "k string, sec long",
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    rows = {r.key: r for r in
            decayed_counts(df, "k", halflife_s=86400, t_ref=base).collect()}
    assert rows["a"].decayed_micro == 1_000_000 + 500_000
    assert rows["b"].decayed_micro == 250_000
    assert rows["a"].n_events == 2


def test_decayed_sum_is_mergeable(spark, sf_dir):
    """Partials built on disjoint splits sum to the whole — the property
    that lets per-partition partial aggregation (and incremental
    maintenance at a pinned t_ref) work."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t_ref = int(ev.agg(F.max(F.unix_timestamp("ts"))).first()[0])
    whole = {r.key: r.decayed_micro
             for r in decayed_counts(ev, "event_type", t_ref=t_ref).collect()}
    lo = ev.where("user_id % 2 = 0")
    hi = ev.where("user_id % 2 = 1")
    merged: dict[str, int] = {}
    for part in (lo, hi):
        for r in decayed_counts(part, "event_type", t_ref=t_ref).collect():
            merged[r.key] = merged.get(r.key, 0) + r.decayed_micro
    assert merged == whole


def test_epoch_floor_parity_on_fractional_seconds(spark):
    """The gotcha the oracle guards: sub-second timestamps truncate in
    Spark's unix_timestamp but ROUND under DuckDB's bare BIGINT cast of
    epoch(); the mirror's explicit FLOOR matches truncation."""
    df = spark.createDataFrame([(1, "2024-01-01 00:00:01.900")],
                               "id long, s string") \
        .select("id", F.to_timestamp("s").alias("ts"))
    spark_sec = df.select(F.unix_timestamp("ts").cast("long")).first()[0]
    con = duckdb.connect()
    rounded, floored = con.execute(
        "SELECT CAST(epoch(TIMESTAMP '2024-01-01 00:00:01.900') AS BIGINT),"
        "       CAST(FLOOR(epoch(TIMESTAMP '2024-01-01 00:00:01.900')) AS BIGINT)"
    ).fetchone()
    assert rounded == spark_sec + 1  # the trap is real on this engine pair
    assert floored == spark_sec      # and the mirror's floor closes it


def test_single_shuffle_plan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = decayed_counts(ev, "user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one map-side-combined groupBy
    assert "HashAggregate" in plan
