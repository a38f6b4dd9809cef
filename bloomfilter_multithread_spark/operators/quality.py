"""Declarative data-quality constraints — a Deequ-style expectation
checker for ingest gates (Schelter et al., VLDB 2018 "Automating
Large-Scale Data Quality Verification" is the public reference shape).

Before a 100 TB corpus enters the sketch/dedup pipeline you assert the
contract the input_hint promises (non-null keys, unique ids, value
domains, ranges). The design constraint here is ONE aggregate pass: all
row-local checks (not-null, range, accepted-values) are conditional
sums and uniqueness is ``count(*) - count(distinct key)``, so the whole
report costs a single map-side-combined aggregate over the scan — no
per-constraint jobs, no second shuffle. The 1-row aggregate is then
reshaped to one row per constraint with a narrow explode.

Every output is an exact integer/boolean, so SQL mirrors are hash-exact
by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    in_range: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate all constraints in one aggregate pass over ``df``.

    Returns (constraint string, n_rows long, n_violations long,
    passed boolean), one row per constraint, ordered by constraint name
    downstream of a deterministic reshape. ``unique`` counts the excess
    rows beyond one per distinct key (0 = unique).
    """
    checks: list[tuple[str, Column]] = []
    for c in not_null:
        checks.append(
            (f"not_null:{c}",
             F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long"))
        )
    for c in unique:
        checks.append(
            (f"unique:{c}",
             (F.count(F.lit(1)) - F.countDistinct(F.col(c))).cast("long"))
        )
    for c, (lo, hi) in (in_range or {}).items():
        cond = F.col(c).isNull() | (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
        checks.append(
            (f"range:{c}", F.sum(F.when(cond, 1).otherwise(0)).cast("long"))
        )
    for c, vals in (accepted or {}).items():
        cond = F.col(c).isNull() | ~F.col(c).isin(list(vals))
        checks.append(
            (f"accepted:{c}", F.sum(F.when(cond, 1).otherwise(0)).cast("long"))
        )
    if not checks:
        raise ValueError("no constraints given")

    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[expr.alias(f"_v{i}") for i, (_, expr) in enumerate(checks)],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.col(f"_v{i}").alias("n_violations"),
            )
            for i, (name, _) in enumerate(checks)
        ]
    )
    return (
        agg.select("n_rows", F.explode(pairs).alias("p"))
        .select(
            F.col("p.constraint").alias("constraint"),
            "n_rows",
            F.col("p.n_violations").alias("n_violations"),
            (F.col("p.n_violations") == 0).alias("passed"),
        )
    )


def duckdb_constraints_sql(
    table: str,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    in_range: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list[str]] | None = None,
) -> str:
    """Hash-exact mirror of :func:`check_constraints` over ``table``
    (which may itself be a CTE/subquery expression)."""
    cols: list[tuple[str, str]] = []
    for c in not_null:
        cols.append((f"not_null:{c}",
                     f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"))
    for c in unique:
        cols.append((f"unique:{c}", f"COUNT(*) - COUNT(DISTINCT {c})"))
    for c, (lo, hi) in (in_range or {}).items():
        cols.append((f"range:{c}",
                     f"SUM(CASE WHEN {c} IS NULL OR {c} < {lo} OR {c} > {hi} "
                     f"THEN 1 ELSE 0 END)"))
    for c, vals in (accepted or {}).items():
        lst = ", ".join("'" + v.replace("'", "''") + "'" for v in vals)
        cols.append((f"accepted:{c}",
                     f"SUM(CASE WHEN {c} IS NULL OR {c} NOT IN ({lst}) "
                     f"THEN 1 ELSE 0 END)"))
    aggs = ",\n                   ".join(
        f"CAST({expr} AS BIGINT) AS v{i}" for i, (_, expr) in enumerate(cols)
    )
    arms = "\n            UNION ALL\n".join(
        f"            SELECT '{name}' AS constraint, n_rows, v{i} AS n_violations,"
        f" v{i} = 0 AS passed FROM a"
        for i, (name, _) in enumerate(cols)
    )
    return f"""
        WITH a AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   {aggs}
            FROM {table}
        )
{arms}
    """
