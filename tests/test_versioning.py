"""snapshot_diff — corpus-version diff semantics and plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.versioning import (
    snapshot_diff,
    snapshot_diff_summary,
)


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, v string, w int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
        "k int, v string, w int",
    )
    return old, new


def test_statuses(spark, snaps):
    old, new = snaps
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, ["k"], ["v", "w"]).collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_include_unchanged_and_null_compare_cols(spark, snaps):
    old, new = snaps
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, ["k"], ["v", "w"],
                                  include_unchanged=True).collect()}
    # key 4 compares NULL == NULL on v — null-safe, so unchanged
    assert got[4] == "unchanged"
    assert len(got) == 5


def test_null_vs_sentinel_not_confused(spark):
    """A NULL value and the literal empty string must not collide in
    the digest (the classic concat-null bug)."""
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "")], "k int, v string")
    got = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert [(r["k"], r["status"]) for r in got] == [(1, "changed")]


def test_multi_column_keys(spark):
    old = spark.createDataFrame([(1, "x", 5), (1, "y", 6)],
                                "a int, b string, v int")
    new = spark.createDataFrame([(1, "x", 5), (2, "y", 6)],
                                "a int, b string, v int")
    got = {(r["a"], r["b"]): r["status"]
           for r in snapshot_diff(old, new, ["a", "b"], ["v"]).collect()}
    assert got == {(1, "y"): "removed", (2, "y"): "added"}


def test_summary_counts(spark, snaps):
    old, new = snaps
    row = snapshot_diff_summary(old, new, ["k"], ["v", "w"]).first()
    assert (row["n_added"], row["n_removed"],
            row["n_changed"], row["n_unchanged"]) == (1, 1, 1, 2)


def test_digests_computed_below_the_join(spark, sf_dir):
    """The exchange payload is (key, digest), never the full row: the
    md5 projection must sit UNDER the join in the plan, and no
    Exchange should carry the compared columns."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    new = old.withColumn("o_custkey", F.col("o_custkey") + 1)
    d = snapshot_diff(old, new, ["o_orderkey"],
                      ["o_custkey", "o_orderstatus"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "md5" in plan
    # the join sees 2-column sides: compared columns are projected away
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "o_custkey" not in line and "o_orderstatus" not in line, line


def test_matches_duckdb_semantic_oracle(spark, sf_dir):
    import duckdb

    from bloomfilter_multithread_spark.operators.versioning import (
        duckdb_snapshot_diff_sql,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.where("o_orderkey % 2 = 0").select(
        "o_orderkey", "o_custkey", "o_orderstatus")
    new = orders.where("o_orderkey % 3 = 0").select(
        "o_orderkey", "o_custkey", "o_orderstatus")
    got = sorted((r["o_orderkey"], r["status"])
                 for r in snapshot_diff(old, new, ["o_orderkey"],
                                        ["o_custkey", "o_orderstatus"]).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    sql = duckdb_snapshot_diff_sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders"
        " WHERE o_orderkey % 2 = 0",
        "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders"
        " WHERE o_orderkey % 3 = 0",
        ["o_orderkey"], ["o_custkey", "o_orderstatus"])
    want = sorted((k, s) for k, s in con.sql(sql).fetchall())
    assert got == want and len(got) > 0


class TestCbfApplySnapshotDelta:
    PARAMS = {"m_slots": 1 << 16, "k": 4, "block_slots": 1 << 12}

    def _snapshots(self, spark, sf_dir):
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id",
            F.concat(F.col("event_type"), F.lit(" "),
                     F.coalesce(F.col("props"), F.lit(""))).alias("text"),
        )
        old = ev.where("event_id % 7 < 6")
        new = ev.where("event_id % 7 > 0").select(
            "event_id",
            F.when(F.col("event_id") % 13 == 0,
                   F.concat(F.col("text"), F.lit("~")))
            .otherwise(F.col("text")).alias("text"),
        )
        return old, new

    def test_maintained_state_byte_equals_scratch_build(self, spark, sf_dir):
        from bloomfilter_multithread_spark.operators.build import (
            SketchSpec,
            build_sketches,
        )
        from bloomfilter_multithread_spark.operators.versioning import (
            cbf_apply_snapshot_delta,
        )

        import numpy as np

        old, new = self._snapshots(spark, sf_dir)
        maintained = cbf_apply_snapshot_delta(
            old, new, ["event_id"], "text", self.PARAMS)
        scratch = build_sketches(
            new, [SketchSpec("d", "cbf", "text", dict(self.PARAMS))],
            route_for="d")["d"]
        # counter-array identity (the wire blob may differ in FORM only:
        # subtract returns the dense form, a routed build is block-local)
        assert np.array_equal(maintained.counters, scratch.counters)
        assert maintained.net_insert_count() == new.count()

    def test_persisted_old_state_is_reused_not_rebuilt(self, spark, sf_dir):
        """Passing cbf_old (the previous run's persisted state) gives
        the identical result — the bootstrap build is not required."""
        from bloomfilter_multithread_spark.operators.build import (
            SketchSpec,
            build_sketches,
        )
        from bloomfilter_multithread_spark.operators.versioning import (
            cbf_apply_snapshot_delta,
        )

        old, new = self._snapshots(spark, sf_dir)
        state = build_sketches(
            old, [SketchSpec("d", "cbf", "text", dict(self.PARAMS))],
            route_for="d")["d"]
        import numpy as np

        a = cbf_apply_snapshot_delta(old, new, ["event_id"], "text",
                                     self.PARAMS, cbf_old=state)
        b = cbf_apply_snapshot_delta(old, new, ["event_id"], "text",
                                     self.PARAMS)
        assert np.array_equal(a.counters, b.counters)

    def test_empty_delta_is_identity(self, spark, sf_dir):
        from bloomfilter_multithread_spark.operators.build import (
            SketchSpec,
            build_sketches,
        )
        from bloomfilter_multithread_spark.operators.versioning import (
            cbf_apply_snapshot_delta,
        )

        old, _ = self._snapshots(spark, sf_dir)
        state = build_sketches(
            old, [SketchSpec("d", "cbf", "text", dict(self.PARAMS))],
            route_for="d")["d"]
        import numpy as np

        same = cbf_apply_snapshot_delta(old, old, ["event_id"], "text",
                                        self.PARAMS, cbf_old=state)
        assert np.array_equal(same.counters, state.counters)
