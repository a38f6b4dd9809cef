"""Data-quality constraint checker — operators/quality.py."""

from __future__ import annotations

import duckdb
import pytest

from bloomfilter_multithread_spark.operators.quality import (
    check_constraints,
    duckdb_constraints_sql,
)


def _df(spark):
    rows = [
        (1, "F", 10.0, "a"),
        (2, "O", 20.0, "b"),
        (2, "O", 30.0, None),    # dup key + null name
        (3, "X", -5.0, "c"),     # bad status + below range
        (4, "F", 999.0, "d"),    # above range
    ]
    return spark.createDataFrame(rows, "id long, status string, price double, name string")


def test_counts_each_violation_kind(spark):
    rep = {
        r["constraint"]: r
        for r in check_constraints(
            _df(spark),
            not_null=("name",),
            unique=("id",),
            in_range={"price": (0.0, 100.0)},
            accepted={"status": ["F", "O"]},
        ).collect()
    }
    assert rep["not_null:name"]["n_violations"] == 1
    assert rep["unique:id"]["n_violations"] == 1  # one excess row
    assert rep["range:price"]["n_violations"] == 2
    assert rep["accepted:status"]["n_violations"] == 1
    assert all(r["n_rows"] == 5 and not r["passed"] for r in rep.values())


def test_clean_data_passes(spark):
    df = _df(spark).where("id IN (1, 4)")
    rep = check_constraints(
        df, not_null=("name",), unique=("id",), in_range={"price": (0.0, 1000.0)}
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def test_single_aggregate_pass(spark):
    # the whole report must be ONE aggregate over the scan: exactly one
    # HashAggregate pair (partial + final), no per-constraint jobs
    plan = (
        check_constraints(
            _df(spark), not_null=("name",), in_range={"price": (0.0, 100.0)},
            accepted={"status": ["F", "O"]},
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") <= 2


def test_duckdb_mirror_hash_exact(spark):
    df = _df(spark)
    got = sorted(
        tuple(r)
        for r in check_constraints(
            df, not_null=("name",), unique=("id",),
            in_range={"price": (0.0, 100.0)}, accepted={"status": ["F", "O"]},
        ).collect()
    )
    con = duckdb.connect()
    con.register("fix", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            duckdb_constraints_sql(
                "fix", not_null=("name",), unique=("id",),
                in_range={"price": (0.0, 100.0)}, accepted={"status": ["F", "O"]},
            )
        ).fetchall()
    )
    assert got == want


def test_no_constraints_raises(spark):
    with pytest.raises(ValueError):
        check_constraints(_df(spark))
