"""Windowed-minimizer (P4) + change-point sessionization (P6) operator
tests — JVM/pandas form equivalence, naive-loop parity, and segment
boundary properties."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.dedup import md5_hash_col
from bloomfilter_multithread_spark.operators.windows import (
    minimizer_window,
    minimizer_window_pandas,
    sessionize_by_change,
)


@pytest.fixture(scope="module")
def hashed(spark, corpus):
    return corpus.select(
        "conv_id", "turn_idx", "tool", md5_hash_col("text").alias("h")
    ).cache()


def test_minimizer_jvm_equals_pandas(spark, hashed):
    base = hashed.select("conv_id", "turn_idx", "h")
    jvm = sorted(map(tuple, minimizer_window(base, ["conv_id"], "turn_idx", "h", w=4)
                     .select("conv_id", "turn_idx", "win_min").collect()))
    pnd = sorted(map(tuple, minimizer_window_pandas(base, ["conv_id"], "turn_idx", "h", w=4)
                     .select("conv_id", "turn_idx", "win_min").collect()))
    assert jvm == pnd
    assert len(jvm) == base.count()


def test_minimizer_matches_naive_loop(spark, hashed):
    conv = hashed.where("conv_id = 'conv-00000007'").select("turn_idx", "h")
    rows = sorted((r["turn_idx"], r["h"]) for r in conv.collect())
    vals = [h for _, h in rows]
    w = 3
    naive = {rows[i][0]: min(vals[i : i + w]) for i in range(len(vals))}
    got = {
        r["turn_idx"]: r["win_min"]
        for r in minimizer_window(conv, [F.lit(1)], "turn_idx", "h", w=w).collect()
    }
    assert got == naive


def test_sliding_min_property_matches_naive():
    """Hypothesis: the vectorized sliding-min kernel equals the naive
    per-position loop for arbitrary int64 sequences and window sizes
    (incl. w > n, w = 1, duplicates, extremes)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bloomfilter_multithread_spark.operators.windows import sliding_min

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=60),
        st.integers(min_value=1, max_value=70),
    )
    def check(vals, w):
        v = np.array(vals, dtype=np.int64)
        got = sliding_min(v, w)
        naive = np.array([min(vals[i : i + w]) for i in range(len(vals))], dtype=np.int64)
        assert np.array_equal(got, naive)

    check()


def test_sessionize_boundary_properties(spark, hashed):
    seg = sessionize_by_change(hashed, ["conv_id"], "turn_idx", "tool").collect()
    by_conv: dict[str, list] = {}
    for r in sorted(seg, key=lambda r: (r["conv_id"], r["turn_idx"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert by_conv
    for rows in by_conv.values():
        # 1-based, contiguous, increments exactly on tool change
        assert rows[0]["seg_id"] == 1
        for prev, cur in zip(rows, rows[1:]):
            if cur["tool"] == prev["tool"]:
                assert cur["seg_id"] == prev["seg_id"]
            else:
                assert cur["seg_id"] == prev["seg_id"] + 1
