"""Grouped sketch aggregation: per-group counts, estimate accuracy per
group, partition-count invariance of the CONTRACT (bounds), HLL-per-group
exactness at small cardinality, and blob hygiene."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.build import SketchSpec
from bloomfilter_multithread_spark.operators.grouped import (
    build_sketches_grouped,
    collect_grouped,
)


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(21)
    rows = []
    for g, mu, n in [("a", 10.0, 4000), ("b", 50.0, 2500), ("c", 200.0, 800)]:
        vals = rng.normal(mu, mu / 5, n)
        ids = rng.integers(0, n // 3, n)
        rows += [(g, float(v), int(i)) for v, i in zip(vals, ids)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "grp string, value double, uid long").cache()


def test_per_group_tdigest_quantiles_within_bound(spark, synth):
    merged = build_sketches_grouped(
        synth, "grp", [SketchSpec("t", "tdigest", "value", {"delta": 200.0})]
    )
    sk = collect_grouped(merged)
    assert set(sk) == {("a", "t"), ("b", "t"), ("c", "t")}
    pdf = synth.toPandas()
    for g in "abc":
        vals = np.sort(pdf[pdf.grp == g].value.values)
        for q in (0.1, 0.5, 0.9):
            est = sk[(g, "t")].quantile(q)
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) <= 0.02, (g, q, rank)


def test_partition_invariance_of_bounds_and_counts(spark, synth):
    for nparts in (1, 7):
        merged = build_sketches_grouped(
            synth.repartition(nparts), "grp",
            [SketchSpec("t", "tdigest", "value", {"delta": 200.0}),
             SketchSpec("h", "hll", "uid", {"p": 14})],
        )
        rows = {(r["group_key"], r["spec_name"]): r["n_rows"] for r in merged.collect()}
        assert rows[("a", "t")] == 4000 and rows[("b", "t")] == 2500
        assert rows[("c", "h")] == 800
        # exactly one row per (group, spec)
        assert len(rows) == 6


def test_hll_per_group_matches_exact_distinct(spark, synth):
    merged = build_sketches_grouped(synth, "grp", [SketchSpec("h", "hll", "uid", {"p": 14})])
    sk = collect_grouped(merged)
    pdf = synth.toPandas()
    for g in "abc":
        exact = pdf[pdf.grp == g].uid.nunique()
        est = sk[(g, "h")].estimate()
        assert abs(est - exact) / exact < 0.05, (g, est, exact)


def test_null_groups_are_dropped(spark):
    df = spark.createDataFrame(
        [(None, 1.0), ("x", 2.0), ("x", 3.0)], "grp string, value double"
    )
    merged = build_sketches_grouped(df, "grp", [SketchSpec("t", "tdigest", "value", {})])
    rows = merged.collect()
    assert [r["group_key"] for r in rows] == ["x"]
    assert rows[0]["n_rows"] == 2
