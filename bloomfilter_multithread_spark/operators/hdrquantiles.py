"""Grouped HDR-histogram quantiles as a pure DataFrame plan — the
dataframe twin of :class:`sketches.hdr.HDRSketch`, sharing the exact
integer bucket mapping, so the sketch path (mapInArrow build + merge)
and this plan produce BIT-IDENTICAL estimates; any engine with integer
arithmetic (DuckDB included) replays them, which is what makes
`hdr_latency_quantiles` the only quantile contract query with a
hash-exact oracle (KLL/t-digest can only be bound-checked).

Spark shape, and why it scales to 100 TB:

    groupBy(group, bucket).count()     -- map-side combinable; the ONE
                                          exchange carries at most
                                          n_groups x n_buckets rows
                                          (~1.2k buckets at sub_bits=5)
                                          REGARDLESS of input rows
    window cumsum over buckets         -- per-group partitions of <=1.2k
                                          rows; no global sort anywhere
    one agg row per group              -- first bucket whose cumulative
                                          count reaches the integer rank

A TB-scale percentile for the price of a KB-scale shuffle. Ranks use
integer ceil `(num*n + den-1) div den` — float `ceil(q*n)` silently
loses ranks once n exceeds 2^53 (pinned in tests/test_hdr.py), which is
precisely the row-count regime this engine is designed for.

The bucket mapping is evaluated with `length(bin(w))` (bit_length — both
Spark and DuckDB render minimal binary strings) and integer shifts; no
floats, no log2 (whose log(x)/log(2) evaluation can be off by an ulp at
exact powers of two — a shifted bucket boundary).

Reference lineage: fixed-size per-thread count structures combined
elementwise (/root/reference/src/main.cpp:119-127 holds q disjoint
filters; the merge it never implements is the elementwise combine done
here by the groupBy's partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hdr_bucket_expr",
    "hdr_lower_bound_expr",
    "hdr_quantiles",
    "duckdb_hdr_quantiles_sql",
]

#: (name, numerator, denominator) — the rational ranks both engines use.
DEFAULT_QS = (("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100))


def hdr_bucket_expr(v: Column, sub_bits: int = 5) -> Column:
    """Bucket index of a non-negative BIGINT value column (see
    sketches/hdr.py for the mapping derivation)."""
    w = v + F.lit(1)
    b = F.length(F.bin(w))
    s1 = sub_bits + 1
    shift = (b - F.lit(s1)).cast("int")
    # F.call_function: the Python shiftleft wrapper only takes an int
    # literal shift; the SQL function itself accepts a column
    pow2 = F.call_function("shiftleft", F.lit(1).cast("long"), shift)
    return F.when(b <= F.lit(s1), w).otherwise(
        shift.cast("long") * F.lit(1 << sub_bits) + (w / pow2).cast("long")
    )


def hdr_lower_bound_expr(idx: Column, sub_bits: int = 5) -> Column:
    """Bucket lower bound back in the value domain (v_lo = w_lo - 1)."""
    shift = (idx / F.lit(1 << sub_bits)).cast("long") - F.lit(1)
    w_lo = F.when(idx < F.lit(1 << (sub_bits + 1)), idx).otherwise(
        F.call_function(
            "shiftleft", idx - shift * F.lit(1 << sub_bits), shift.cast("int")
        )
    )
    return w_lo - F.lit(1)


def hdr_quantiles(df: DataFrame, value_col: str, group_col: str,
                  qs=DEFAULT_QS, unit_scale: int = 1000,
                  sub_bits: int = 5) -> DataFrame:
    """Per-group HDR quantile estimates:
    (group, n_events, <name>_units per rank) where every estimate is the
    lower bound of the bucket containing rank ceil(num/den * n) —
    deterministic, hence oracle-replayable. Units are
    floor(value * unit_scale)."""
    v = F.floor(F.col(value_col) * F.lit(unit_scale)).cast("long")
    hist = (
        df.select(F.col(group_col).alias("grp"),
                  hdr_bucket_expr(v, sub_bits).alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy("grp").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    cum = F.sum("c").over(wcum)
    n = F.sum("c").over(wall)
    cols = [F.col("grp"), F.col("bucket"), n.alias("n"), cum.alias("cum")]
    ranked = hist.select(*cols)
    aggs = [F.max("n").cast("long").alias("n_events")]
    for name, num, den in qs:
        rank = (F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den)
        hit_bucket = F.min(
            F.when(F.col("cum") >= rank.cast("long"), F.col("bucket"))
        )
        aggs.append(
            hdr_lower_bound_expr(hit_bucket, sub_bits)
            .cast("long")
            .alias(f"{name}_units")
        )
    return ranked.groupBy("grp").agg(*aggs).withColumnRenamed("grp", group_col)


def duckdb_hdr_quantiles_sql(table: str, value_col: str, group_col: str,
                             qs=DEFAULT_QS, unit_scale: int = 1000,
                             sub_bits: int = 5,
                             where: str | None = None) -> str:
    """Exact DuckDB mirror of :func:`hdr_quantiles`: same bit_length via
    `length(bin(w))`, same integer shifts (`<<`/`>>`), same integer-ceil
    ranks, same lower-bound decode. Integer `//` is DuckDB's `div`-free
    floor division on BIGINTs."""
    s1 = sub_bits + 1
    p = 1 << sub_bits
    cond = f"WHERE {where}" if where else ""
    qcols = []
    for name, num, den in qs:
        qcols.append(f"""
          CAST(CASE WHEN hb_{name} < {2 * p} THEN hb_{name}
               ELSE (hb_{name} - ((hb_{name} // {p}) - 1) * {p})
                    << ((hb_{name} // {p}) - 1) END - 1 AS BIGINT)
            AS {name}_units""")
    qhits = []
    for name, num, den in qs:
        qhits.append(f"""
          MIN(CASE WHEN cum >= ({num} * n + {den - 1}) // {den}
                   THEN bucket END) AS hb_{name}""")
    return f"""
      WITH units AS (
        SELECT {group_col} AS grp,
               CAST(FLOOR({value_col} * {unit_scale}) AS BIGINT) + 1 AS w
        FROM {table} {cond}
      ),
      buckets AS (
        SELECT grp,
               CASE WHEN length(bin(w)) <= {s1} THEN w
                    ELSE (length(bin(w)) - {s1}) * {p}
                         + (w // (1::BIGINT << (length(bin(w)) - {s1})))
               END AS bucket
        FROM units
      ),
      hist AS (
        SELECT grp, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM buckets GROUP BY grp, bucket
      ),
      ranked AS (
        SELECT grp, bucket,
               SUM(c) OVER (PARTITION BY grp) AS n,
               SUM(c) OVER (PARTITION BY grp ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
      ),
      hits AS (
        SELECT grp, CAST(MAX(n) AS BIGINT) AS n_events,
               {", ".join(qhits)}
        FROM ranked GROUP BY grp
      )
      SELECT grp AS {group_col}, n_events, {", ".join(qcols)}
      FROM hits
    """
