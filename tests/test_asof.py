"""As-of join: hand-built cases + a property check against
``pandas.merge_asof`` (the canonical single-node implementation),
including tolerance semantics and inclusive-tie behavior."""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=int(s))


def _run(spark, probe_rows, ref_rows, **kw):
    probe = spark.createDataFrame(
        [(int(i), int(k), _ts(s)) for i, k, s in probe_rows],
        "pid long, k long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [(int(k), _ts(s), int(v)) for k, s, v in ref_rows],
        "k long, ts timestamp, v long",
    )
    out = asof_join(probe, ref, on="k", ts="ts", payload=("v",), tiebreak="v", **kw)
    return {r["pid"]: r["asof_v"] for r in out.collect()}


def test_basic_backward_match(spark):
    got = _run(
        spark,
        probe_rows=[(1, 7, 10), (2, 7, 3), (3, 8, 10)],
        ref_rows=[(7, 5, 50), (7, 9, 90), (8, 11, 110)],
    )
    # pid 1 at t=10 sees ref t=9; pid 2 at t=3 predates all refs; pid 3's
    # only ref is in the future
    assert got == {1: 90, 2: None, 3: None}


def test_tie_is_inclusive_and_tiebreak_takes_last(spark):
    got = _run(
        spark,
        probe_rows=[(1, 7, 5)],
        ref_rows=[(7, 5, 50), (7, 5, 40)],
    )
    # ref at the probe's exact ts matches (>=); max tiebreak wins
    assert got == {1: 50}


def test_tolerance_nulls_stale_matches(spark):
    got = _run(
        spark,
        probe_rows=[(1, 7, 100), (2, 7, 12)],
        ref_rows=[(7, 10, 10)],
        tolerance=F.expr("INTERVAL 5 SECONDS"),
    )
    assert got == {1: None, 2: 10}


def test_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(11)
    n_p, n_r = 400, 300
    probe = pd.DataFrame({
        "pid": np.arange(n_p),
        "k": rng.integers(0, 12, n_p),
        "ts": [T0 + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 5000, n_p)],
    })
    ref = pd.DataFrame({
        "k": rng.integers(0, 12, n_r),
        "ts": [T0 + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 5000, n_r)],
        "v": np.arange(n_r),
    })
    # make (k, ts) unique on the ref side so the match is well-defined
    ref = ref.drop_duplicates(subset=["k", "ts"], keep="last").reset_index(drop=True)

    want_df = pd.merge_asof(
        probe.sort_values("ts", kind="stable"),
        ref.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    )
    want = {int(r.pid): (None if pd.isna(r.v) else int(r.v))
            for r in want_df.itertuples()}

    sp = spark.createDataFrame(probe)
    sr = spark.createDataFrame(ref)
    out = asof_join(sp, sr, on="k", ts="ts", payload=("v",), tiebreak="v")
    got = {r["pid"]: r["asof_v"] for r in out.collect()}
    assert got == want


def test_match_carries_ref_ts(spark):
    probe = spark.createDataFrame([(1, 7, _ts(10))], "pid long, k long, ts timestamp")
    ref = spark.createDataFrame([(7, _ts(4), 40)], "k long, ts timestamp, v long")
    row = asof_join(probe, ref, on="k", ts="ts", payload=("v",)).collect()[0]
    assert row["asof_ts"] == _ts(4)
    assert row["asof_v"] == 40


def test_plan_is_single_window_no_quadratic_join(spark):
    """The scale contract: one hashpartitioning exchange on the key, no
    BroadcastNestedLoopJoin/CartesianProduct from the ts inequality."""
    probe = spark.createDataFrame([(1, 7, _ts(10))], "pid long, k long, ts timestamp")
    ref = spark.createDataFrame([(7, _ts(4), 40)], "k long, ts timestamp, v long")
    plan = asof_join(probe, ref, on="k", ts="ts", payload=("v",))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
