"""Exponentially-decayed counts — the "trending now" aggregate: every
event contributes 2^(-age/halflife), so a key's score is a freshness-
weighted event count that a dashboard can rank without ever re-scanning
history (the decayed sum is mergeable: partials decay independently
because the reference instant is shared).

Spark shape: ONE map-side-combinable groupBy — the per-event decay
factor is a codegen expression over integer epoch seconds, so partial
aggregation happens before the exchange and the shuffle carries one
(key, long, long) row per key per map task.  The reference instant is
the corpus max timestamp (scalar agg, sanctioned driver collect; any
pinned literal instant works the same and is the 100-TB deployment
mode — pass ``t_ref``).

Cross-engine exactness: contributions are micro-rounded BEFORE the
integer sum (the package-wide BM25/NLL idiom — operators/textstats.py),
ages are integer-second deltas (`unix_timestamp` ≡ DuckDB `epoch`, both
instant arithmetic), and both engines evaluate the same
pow(2, -age/halflife) double expression; the 1e-6 micro quantum leaves
~4 orders of magnitude of margin over worst-case libm/fdlibm pow ulp
drift, the same budget the BM25 oracle documents.

Reference lineage: decay-weighting a membership count is the Bloom
counter question (/root/reference/src/SkmerSplitter.cpp:91-151 "have we
seen it") graded by recency instead of binarized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["decayed_counts", "duckdb_decayed_counts_sql"]


def decayed_counts(df: DataFrame, key_col: str, ts_col: str = "ts",
                   halflife_s: int = 86400,
                   t_ref: int | None = None) -> DataFrame:
    """Per-key exponentially-decayed event counts:
    (key, n_events, decayed_micro) where

        decayed_micro = Σ_events floor(2^(-(t_ref - epoch(ts))/halflife)
                                       * 1e6 + 0.5)

    ``t_ref`` defaults to the corpus max epoch second (one scalar agg);
    production pipelines pass the pinned evaluation instant instead.
    A key whose events are all fresh scores ~1e6 per event; one
    halflife of age halves a contribution."""
    if t_ref is None:
        t_ref = int(
            df.agg(F.max(F.unix_timestamp(ts_col)).alias("m")).collect()[0]["m"]
        )
    age = F.lit(t_ref) - F.unix_timestamp(ts_col).cast("long")
    contrib = F.floor(
        F.pow(F.lit(2.0), -(age.cast("double") / F.lit(float(halflife_s))))
        * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(contrib).cast("long").alias("decayed_micro"),
        )
    )


def duckdb_decayed_counts_sql(table: str, key_col: str, ts_col: str = "ts",
                              halflife_s: int = 86400,
                              t_ref_sql: str | None = None) -> str:
    """Exact mirror of :func:`decayed_counts` — same integer ages, same
    per-event micro floor, same integer sum.  ``t_ref_sql`` defaults to
    the same corpus-max subquery the operator's scalar agg computes.

    DuckDB subtlety: ``epoch(ts)`` is a DOUBLE carrying sub-second
    fraction and a bare BIGINT cast ROUNDS, while Spark's
    ``unix_timestamp`` truncates — so the mirror must floor explicitly
    (``CAST(FLOOR(epoch(ts)) AS BIGINT)``; parity pinned in tests on
    the fractional-second events fixture)."""
    t_ref = (
        t_ref_sql
        or f"(SELECT MAX(CAST(FLOOR(epoch({ts_col})) AS BIGINT)) FROM {table})"
    )
    return f"""
        SELECT {key_col} AS key,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(pow(2.0,
                        -(({t_ref} - CAST(FLOOR(epoch({ts_col})) AS BIGINT))
                          / {float(halflife_s)}))
                        * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS decayed_micro
        FROM {table}
        GROUP BY {key_col}
    """
