"""Distributed global ordering primitives — rank / ntile WITHOUT the
single-partition window.

The trap this module exists to avoid: Spark's ``row_number()`` /
``ntile()`` over a ``Window.orderBy(...)`` with no ``partitionBy`` moves
EVERY row into one window partition (the physical plan grows an
``Exchange SinglePartition``) — a correct answer at sf0.01 and a dead
executor at 100 TB.  Global order statistics are still perfectly
distributable; they just need the classic two-pass shape (the same one
``zipWithIndex`` uses, kept here in DataFrame/JVM land):

  1. range-partition + sort by the order key (Spark's normal
     distributed-sort machinery: sampled boundaries, P balanced
     partitions);
  2. count rows per partition — P longs to the driver, nothing else;
  3. per-partition local ``row_number`` (window PARTITIONED by the
     range-partition id, so no partition exceeds its range slice) plus
     the broadcast cumulative offset.

Cost at scale: one range exchange (the sort you were going to pay
anyway), one hash exchange on the partition id, and a P-row collect.
No step concentrates more than 1/P of the data on one task.

The caller's ``order_cols`` must be a TOTAL order (append a unique
tiebreak column such as the row id) — otherwise ranks of tied rows are
partition-placement-dependent.  With a total order the result is a
deterministic permutation: any engine, any parallelism, any retry.

Reference analog: the positioned result-assembly loop
(/root/reference/src/main.cpp:163-212) — the main thread drains each
worker's answer FIFO and writes every ``KmerAnswer`` into its correct
slot of the global output bitvector; ``global_rank`` is that
"per-worker partials + global positions" step as a distributed
operator instead of a driver loop.

Pipeline consumers in this package: CCNet-style perplexity tiering
(head/middle/tail thirds over the unigram-NLL score — Wenzek et al.
2020 §4.3) and deterministic epoch shuffling / shard assignment for
training-data serving, both registered as contract queries in
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["global_rank", "global_ntile"]

_PID = "_gr_pid"


def _ranked(df: DataFrame, order_cols: list[str],
            num_partitions: int | None) -> tuple[DataFrame, int]:
    """Shared two-pass core: returns (df + ``_gr_rank`` column, n_rows).

    The intermediate (range-partitioned, pid-stamped) frame is persisted
    so the per-partition counts and the final ranked output see the SAME
    partition placement — ``spark_partition_id()`` is only meaningful
    against a materialized partitioning.  The persist is unpersisted by
    a listener-free best effort: callers that need strict cache hygiene
    can ``.unpersist()`` the returned frame's source themselves; the
    blob is (rows × order-key width), not the full table, only when the
    caller pre-projects — as the contract queries do.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) for c in order_cols]
    staged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    sizes = {
        r[_PID]: r["n"]
        for r in staged.groupBy(_PID).agg(F.count("*").alias("n")).collect()
    }
    n_rows = sum(sizes.values())
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], f"{_PID} int, _gr_off long"
    )
    local = Window.partitionBy(_PID).orderBy(*cols)
    ranked = (
        staged.join(F.broadcast(off_df), _PID)
        .withColumn(
            "_gr_rank",
            (F.row_number().over(local).cast("long") - F.lit(1) + F.col("_gr_off")),
        )
        .drop(_PID, "_gr_off")
    )
    return ranked, n_rows


def global_rank(df: DataFrame, order_cols: list[str], rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Add a 0-based global row index under ``order_cols`` (ascending,
    must be a total order).  Equal to
    ``row_number().over(Window.orderBy(*order_cols)) - 1`` but without
    the ``Exchange SinglePartition`` that form plans (asserted in
    tests/test_ranking.py)."""
    ranked, _ = _ranked(df, order_cols, num_partitions)
    return ranked.withColumnRenamed("_gr_rank", rank_col)


def global_ntile(df: DataFrame, n: int, order_cols: list[str],
                 bucket_col: str = "bucket",
                 num_partitions: int | None = None) -> DataFrame:
    """Add the 1-based NTILE(n) bucket under a global total order —
    SQL-standard tile sizing (the first ``N % n`` buckets get
    ``ceil(N/n)`` rows, the rest ``floor(N/n)``), verified tile-for-tile
    against both Spark's and DuckDB's ``NTILE`` in tests.  N is taken
    from the per-partition counts the rank pass already collected, so
    no extra job."""
    if n < 1:
        raise ValueError("n >= 1")
    ranked, n_rows = _ranked(df, order_cols, num_partitions)
    q, rem = divmod(n_rows, n)
    big = q + 1  # size of each of the first `rem` buckets
    r = F.col("_gr_rank")
    if q == 0:  # fewer rows than buckets: row i -> bucket i+1
        bucket = r + F.lit(1)
    else:
        # integer `div`, not float `/`: ranks can exceed 2**53 at scale
        bucket = (
            F.when(r < F.lit(rem * big), F.expr(f"_gr_rank div {big}"))
            .otherwise(F.lit(rem) + F.expr(f"(_gr_rank - {rem * big}) div {q}"))
            + F.lit(1)
        )
    return ranked.withColumn(bucket_col, bucket.cast("long")).drop("_gr_rank")
