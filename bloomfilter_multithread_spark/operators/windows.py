"""Ordered-window operators over keyed sequences — the reference's
per-position minimizer and segmentation phases re-expressed on
(conv_id, turn_idx)-ordered transcript turns.

- ``minimizer_window``: per-key sliding min over ``w`` consecutive hash
  values — the reference's windowed minimum over k-m+1 consecutive
  m-mer hashes (/root/reference/src/SkmerExtractor.cpp:20-21,77-80,
  146-149), where DNA position order becomes turn order. Pure JVM
  window aggregation (whole-stage codegen, one shuffle on the key),
  with an exact ``MIN() OVER (ROWS BETWEEN ...)`` SQL mirror.
- ``minimizer_window_pandas``: the same semantics as a vectorized
  numpy ``sliding_window_view`` reduction inside ``applyInPandas`` —
  the shape you'd use when the per-position reduction is NOT a plain
  min/max Spark can codegen (e.g. argmin with tie rules, custom
  robust scores). Tested equal to the JVM form.
- ``sessionize_by_change``: change-point segmentation — a new segment
  starts whenever a column's value differs from the previous row's
  (null-safe), per key in sequence order; segment ids are a running
  sum of change flags. The reference's super-k-mer segmentation
  (minimizer-change splitting, src/SkmerExtractor.cpp:126-176) as a
  transcript operator: e.g. grouping consecutive same-tool turns into
  tool-call episodes.

Scale notes: both are single-shuffle window plans (exchange on the
partition key, in-partition sort); no self-joins, no Python in the
JVM forms. At 10^12 turns the shuffle is by conv_id — the same
key-partitioning every other per-conversation op reuses.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def minimizer_window(df: DataFrame, key_cols: Sequence[str], order_col: str,
                     value_col: str | Column, w: int,
                     out_col: str = "win_min") -> DataFrame:
    """Adds ``out_col`` = min of ``value_col`` over the w-row window
    [current row, current row + w-1] within each key, ordered by
    ``order_col`` — the per-position minimizer (reference
    SkmerExtractor.cpp:77-80; forward-looking window, matching the
    reference's "window starting at position i")."""
    win = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, w - 1)
    )
    v = F.expr(value_col) if isinstance(value_col, str) else value_col
    return df.withColumn(out_col, F.min(v).over(win))


def sliding_min(v: np.ndarray, w: int) -> np.ndarray:
    """Forward-looking rolling min: out[i] = min(v[i : i+w]), windows
    shrinking at the tail (= ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING
    at the partition edge). Vectorized via sliding_window_view over a
    max-padded tail — the padding can never win a min against the real
    suffix values."""
    n = len(v)
    if n == 0:
        return v
    eff = min(w, n)
    pad = np.full(eff - 1, v.max(), dtype=v.dtype)
    win = np.lib.stride_tricks.sliding_window_view(np.concatenate([v, pad]), eff)
    return win.min(axis=1)


def minimizer_window_pandas(df: DataFrame, key_cols: Sequence[str], order_col: str,
                            value_col: str, w: int,
                            out_col: str = "win_min") -> DataFrame:
    """Same semantics as ``minimizer_window``, computed per key group
    with a vectorized numpy sliding-window reduction (Arrow batches, no
    per-row Python). The escape hatch for reductions Spark's window
    functions can't express; kept bit-identical to the JVM form by
    tests/test_windows.py."""
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} {df.schema[value_col].dataType.simpleString()}"]
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pdf[out_col] = sliding_min(pdf[value_col].to_numpy(), w)
        return pdf

    return df.groupBy(*key_cols).applyInPandas(per_key, schema=schema)


def duckdb_minimizer_sql(source_cte: str, key_cols: str, order_col: str,
                         value_expr: str, w: int, out_col: str = "win_min") -> str:
    """Oracle mirror of ``minimizer_window`` over a CTE body."""
    return f"""
        WITH src AS ({source_cte})
        SELECT {key_cols}, {order_col},
               MIN({value_expr}) OVER (
                   PARTITION BY {key_cols} ORDER BY {order_col}
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
               ) AS {out_col}
        FROM src
    """


def sessionize_by_change(df: DataFrame, key_cols: Sequence[str], order_col: str,
                         change_col: str, seg_col: str = "seg_id") -> DataFrame:
    """Adds ``seg_col``: 1-based segment id per key, incremented whenever
    ``change_col`` differs (null-safely) from the previous row in
    ``order_col`` order — change-point sessionization (reference
    super-k-mer splitting on minimizer change,
    src/SkmerExtractor.cpp:126-176). One window shuffle; the running
    sum stays in codegen."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    # row_number()==1 opens the first segment explicitly: lag() returns
    # NULL both for "no previous row" and "previous value was NULL", so
    # null-safe comparison alone would start a null-valued first run at
    # segment 0
    chg = (
        (F.row_number().over(w) == 1)
        | ~F.col(change_col).eqNullSafe(F.lag(change_col).over(w))
    ).cast("long")
    running = Window.partitionBy(*key_cols).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(seg_col, F.sum(chg).over(running))
