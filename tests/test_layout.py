"""Z-order layout — operators/layout.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.layout import (
    duckdb_zorder_expr,
    write_zordered,
    zorder_key,
)


def _grid_df(spark, n=20_000, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), int(a), int(b))
        for i, (a, b) in enumerate(
            zip(rng.integers(0, 1024, n), rng.integers(0, 1024, n))
        )
    ]
    return spark.createDataFrame(rows, "id long, a long, b long")


def test_interleave_matches_python_reference(spark):
    df = _grid_df(spark, n=500)
    got = {r["id"]: r["z"] for r in df.select("id", zorder_key(["a", "b"], 10).alias("z")).collect()}
    for r in df.collect():
        z = 0
        for i in range(10):
            z |= ((r["a"] >> i) & 1) << (2 * i)
            z |= ((r["b"] >> i) & 1) << (2 * i + 1)
        assert got[r["id"]] == z


def test_duckdb_expr_mirror(spark):
    df = _grid_df(spark, n=300)
    got = sorted(
        (r["id"], r["z"])
        for r in df.select("id", zorder_key(["a", "b"], 10).alias("z")).collect()
    )
    con = duckdb.connect()
    con.register("g", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT id, {duckdb_zorder_expr(['a', 'b'], 10)} AS z FROM g"
        ).fetchall()
    )
    assert got == want


def test_zorder_is_monotone_in_locality(spark):
    # points close in BOTH dims must be close in z; quadrant structure:
    # the top bit of z's odd positions is b's top bit etc.
    df = spark.createDataFrame(
        [(0, 0, 0), (1, 1023, 1023), (2, 0, 1023), (3, 1023, 0)],
        "id long, a long, b long",
    )
    z = {r["id"]: r["z"] for r in df.select("id", zorder_key(["a", "b"], 10).alias("z")).collect()}
    assert z[0] == 0 and z[1] == (1 << 20) - 1
    # quadrants: (0,1023) has all odd bits set, (1023,0) all even bits
    assert z[2] == sum(1 << (2 * i + 1) for i in range(10))
    assert z[3] == sum(1 << (2 * i) for i in range(10))


def test_zorder_layout_concentrates_range_predicates(spark, tmp_path):
    """The point of the layout: a 1/32-wide range on `a` must touch
    FEWER files under z-order(a,b) than under a sort on `b` (where `a`
    is uniform within every file, so every file matches). File 'touch'
    is measured as files that actually CONTAIN matching rows — the set
    a min-max skipper would have to read."""
    df = _grid_df(spark)
    zpath, bpath = f"{tmp_path}/z", f"{tmp_path}/b"
    write_zordered(df, zpath, zorder_key(["a", "b"], 10), n_files=16)
    (
        df.repartitionByRange(16, "b").sortWithinPartitions("b")
        .write.parquet(bpath)
    )

    def files_touched(path):
        d = spark.read.parquet(path).where("a BETWEEN 96 AND 127")
        return d.select(F.input_file_name()).distinct().count()

    zt, bt = files_touched(zpath), files_touched(bpath)
    assert bt == 16  # b-sorted layout: every file spans all of a
    assert zt <= 8  # z-order: the slab lives in a minority of files
    # and the data survived intact
    assert spark.read.parquet(zpath).count() == df.count()


def test_morton_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bloomfilter_multithread_spark.operators.layout import (
        morton_decode,
        morton_encode,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=(1 << 15) - 1),
                 min_size=2, max_size=4)
    )
    def check(vals):
        bits = 15
        z = morton_encode(vals, bits)
        assert morton_decode(z, len(vals), bits) == vals
        assert 0 <= z < 1 << (bits * len(vals))

    check()


def test_spark_key_matches_python_reference_spot(spark):
    from bloomfilter_multithread_spark.operators.layout import morton_encode

    df = spark.createDataFrame([(5, 1023), (0, 0), (777, 312)], "a long, b long")
    got = [r["z"] for r in df.select(zorder_key(["a", "b"], 10).alias("z")).collect()]
    assert got == [morton_encode([a, b], 10) for a, b in [(5, 1023), (0, 0), (777, 312)]]


class TestCompactFiles:
    """Small-file compaction (VERDICT r3 #5) — the engine's own
    checkpoint/epoch writers fragment storage; compact_files rewrites to
    target-size files, optionally preserving an existing clustering."""

    def _fragment(self, spark, tmp_path, n_files=32, n=5000):
        src = str(tmp_path / "frag")
        (spark.range(n)
         .selectExpr("id", "id % 100 AS a", "CAST(md5(CAST(id AS STRING)) AS STRING) AS payload")
         .repartition(n_files)
         .write.parquet(src))
        return src

    def test_compacts_to_target_and_preserves_content(self, spark, tmp_path):
        from bloomfilter_multithread_spark.operators.layout import (
            compact_files,
            dir_parquet_stats,
        )

        src = self._fragment(spark, tmp_path)
        n_before, bytes_before = dir_parquet_stats(src)
        assert n_before == 32
        dst = str(tmp_path / "out")
        stats = compact_files(spark, src, dst,
                              target_file_bytes=max(bytes_before // 4, 1),
                              sort_key="id")
        assert stats["n_files_after"] == stats["n_files_target"] <= 5
        assert stats["n_files_after"] < stats["n_files_before"]
        assert stats["rows"] == 5000
        before = {tuple(r) for r in spark.read.parquet(src).collect()}
        after = {tuple(r) for r in spark.read.parquet(dst).collect()}
        assert before == after

    def test_coalesce_path_has_no_shuffle(self, spark, tmp_path):
        from bloomfilter_multithread_spark.operators.layout import compact_files

        src = self._fragment(spark, tmp_path)
        dst = str(tmp_path / "out")
        df = spark.read.parquet(src).coalesce(3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure partition concatenation
        compact_files(spark, src, dst, target_file_bytes=1 << 40)  # -> 1 file
        files = [f for f in __import__("os").listdir(dst) if f.endswith(".parquet")]
        assert len(files) == 1

    def test_preserves_zorder_clustering(self, spark, tmp_path):
        """Compacting a z-ordered table through sort_key='_z'... the
        contract: per-file key ranges stay DISJOINT after the rewrite,
        so min-max file skipping still prunes."""
        from bloomfilter_multithread_spark.operators.layout import (
            compact_files,
            write_zordered,
            zorder_key,
        )

        df = (spark.range(20_000)
              .selectExpr("id % 128 AS a", "CAST(id / 128 AS LONG) AS b"))
        zsrc = str(tmp_path / "z")
        # keep the z key as a stored column so compaction can range-sort it
        (df.withColumn("zval", zorder_key(["a", "b"], 7))
         .repartitionByRange(16, "zval").sortWithinPartitions("zval")
         .write.parquet(zsrc))
        dst = str(tmp_path / "zc")
        _, total = __import__(
            "bloomfilter_multithread_spark.operators.layout",
            fromlist=["dir_parquet_stats"]).dir_parquet_stats(zsrc)
        stats = compact_files(spark, zsrc, dst,
                              target_file_bytes=max(total // 4, 1),
                              sort_key="zval")
        assert stats["n_files_after"] < 16
        ranges = sorted(
            (r["lo"], r["hi"])
            for r in spark.read.parquet(dst)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
            .collect()
        )
        assert all(ranges[i][1] <= ranges[i + 1][0] for i in range(len(ranges) - 1))
