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
