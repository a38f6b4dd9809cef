"""Band join: brute-force parity on random timestamps, boundary
inclusivity, block-edge pairs, left semantics, and the no-quadratic-plan
contract."""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.rangejoin import band_join

T0 = dt.datetime(2024, 1, 1)


def _ts(us):
    return T0 + dt.timedelta(microseconds=int(us))


def _pairs(spark, probe_us, ref_us, w, how="inner"):
    probe = spark.createDataFrame(
        [(i, _ts(u)) for i, u in enumerate(probe_us)], "pid long, ts timestamp"
    )
    ref = spark.createDataFrame(
        [(i, _ts(u)) for i, u in enumerate(ref_us)], "rid long, ts timestamp"
    )
    out = band_join(probe, ref, ts="ts", tolerance_us=w, payload=("rid",), how=how)
    return sorted((r["pid"], r["ref_rid"]) for r in out.collect())


def test_matches_brute_force_on_random_data(spark):
    rng = np.random.default_rng(4)
    w = 1000
    probe_us = rng.integers(0, 60_000, 150)
    ref_us = rng.integers(0, 60_000, 200)
    want = sorted(
        (pi, ri)
        for pi, pu in enumerate(probe_us)
        for ri, ru in enumerate(ref_us)
        if abs(int(pu) - int(ru)) <= w
    )
    assert _pairs(spark, probe_us, ref_us, w) == want
    assert len(want) > 50  # fixture sanity


def test_boundary_is_inclusive_and_block_edges_pair_once(spark):
    w = 100
    # refs exactly at +-w, straddling block boundaries relative to probe
    got = _pairs(spark, [250], [150, 350, 351, 149, 250], w)
    assert got == [(0, 0), (0, 1), (0, 4)]


def test_left_keeps_unmatched_probes(spark):
    got = _pairs(spark, [100, 99_000], [120], 50, how="left")
    assert got == [(0, 0), (1, None)]


def test_plan_has_no_quadratic_join(spark):
    probe = spark.createDataFrame([(1, _ts(0))], "pid long, ts timestamp")
    ref = spark.createDataFrame([(1, _ts(10))], "rid long, ts timestamp")
    plan = band_join(probe, ref, payload=("rid",))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
