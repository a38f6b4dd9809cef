"""DataFrame HDR quantiles: exact-region closed form, DuckDB mirror
parity, sketch-path bit-identity, and the bounded-shuffle plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.hdrquantiles import (
    duckdb_hdr_quantiles_sql,
    hdr_quantiles,
)


def test_exact_region_closed_form(spark):
    """Values 1..20 at unit_scale=1 live in the exact bucket region, so
    the estimates ARE the true order statistics."""
    df = spark.createDataFrame([(i % 2, float(i)) for i in range(1, 21)],
                               "g int, v double")
    out = {r.g: r for r in
           hdr_quantiles(df, "v", "g", unit_scale=1).collect()}
    # group 1 holds odds 1..19 (n=10): ranks ceil(5)=5 -> 9,
    # ceil(9.5)=10 -> 19, ceil(9.9)=10 -> 19
    assert (out[1].n_events, out[1].p50_units, out[1].p95_units,
            out[1].p99_units) == (10, 9, 19, 19)
    # group 0 holds evens 2..20
    assert (out[0].p50_units, out[0].p99_units) == (10, 20)


def test_duckdb_mirror_parity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r.event_type: (r.n_events, r.p50_units, r.p95_units, r.p99_units)
        for r in hdr_quantiles(ev, "value", "event_type").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sql = duckdb_hdr_quantiles_sql("events", "value", "event_type")
    want = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_sketch_path_bit_identical(spark, sf_dir):
    """The mapInArrow-built, partition-merged HDRSketch and the pure
    DataFrame plan decode the SAME estimates — not within a bound,
    EQUAL (the mapping is deterministic)."""
    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_sketches,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = build_sketches(
        ev, [SketchSpec("h", "hdr", "value", {"sub_bits": 5, "unit_scale": 1000})]
    )["h"]
    df_all = hdr_quantiles(ev.withColumn("one", F.lit(1)), "value", "one").first()
    assert sk.n_total == df_all.n_events
    assert sk.quantile_frac(1, 2) == df_all.p50_units
    assert sk.quantile_frac(19, 20) == df_all.p95_units
    assert sk.quantile_frac(99, 100) == df_all.p99_units


def test_plan_shuffles_are_bounded(spark, sf_dir):
    """Two exchanges max, BOTH carrying the combined histogram
    (<= n_groups x ~1.2k buckets rows), never raw events: partial
    aggregation must appear below the first exchange."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = hdr_quantiles(ev, "value", "event_type")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan
    first_exchange = plan.index("Exchange")
    below = plan[first_exchange:]
    assert "partial_count" in below or "partial" in below, plan
