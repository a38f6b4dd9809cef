"""Band (range-proximity) join — match rows whose timestamps fall within
a tolerance of each other WITHOUT an inequality join.

Spark turns a bare ``ON abs(l.ts - r.ts) <= W`` into a
BroadcastNestedLoopJoin (quadratic — the plan shape the contract tests
ban); the scalable formulation is bucketization: quantize time into
blocks of the tolerance width, explode each probe row to its block and
the two adjacent blocks, equi-join on the block id, then apply the exact
band predicate. Every true match lands in exactly one (probe_block ==
ref_block) bucket pair because the ref row's block is within +-1 of the
probe's whenever |dt| <= W — so no dedup is needed and the join stays a
plain shuffled hash join on an integer key.

Cost at 100 TB: shuffle 3x|probe| + |ref| rows of (block, us, payload) —
linear, bounded, prunable by any pushed-down time filter; a dense hot
second can be salted like any other skewed equi-key (the block id is an
ordinary long). This is the standard interval-bucketing scheme every
distributed range-join implementation uses (e.g. Spark's own
range-join-hint bucketing in DBR, or the tumbling-window interval join
of Flink's datastream API — public pattern, implemented from scratch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    probe: DataFrame,
    ref: DataFrame,
    ts: str = "ts",
    tolerance_us: int = 120_000_000,
    payload: Sequence[str] = (),
    how: str = "inner",
    prefix: str = "ref_",
) -> DataFrame:
    """Pairs (probe row, ref row) with ``|probe.ts - ref.ts| <=
    tolerance_us`` (inclusive, exact integer microseconds).

    how='inner' yields one row per matching pair; how='left' keeps
    probe rows with no match (NULL ref columns) — the unmatched set is
    recovered by an anti join on the full probe row, so probe rows must
    be distinct (give them an id column; true duplicates would collapse). Returns probe columns
    plus ``{prefix}{col}`` for each payload column and ``{prefix}us``
    (the matched ref timestamp in epoch microseconds).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    w = int(tolerance_us)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731

    p = probe.withColumn("_us", us(ts)).withColumn(
        "_blk", F.explode(F.array(*[
            (F.floor(F.col("_us") / w) + d).cast("long") for d in (-1, 0, 1)
        ]))
    )
    r = ref.select(
        F.floor(us(ts) / w).cast("long").alias("_blk"),
        us(ts).alias(f"{prefix}us"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    cond = (p["_blk"] == r["_blk"]) & (
        F.abs(p["_us"] - F.col(f"{prefix}us")) <= F.lit(w)
    )
    if how == "inner":
        out = p.join(r, cond, "inner")
        return out.select(*probe.columns, f"{prefix}us",
                          *[f"{prefix}{c}" for c in payload])
    # left: inner pairs ++ unmatched probes (anti join), cheaper than a
    # 3x-exploded left-outer that would triplicate the null rows
    inner = p.join(r, cond, "inner").select(
        *probe.columns, f"{prefix}us", *[f"{prefix}{c}" for c in payload]
    )
    matched_ids = inner.select(*probe.columns).distinct()
    unmatched = probe.join(matched_ids, probe.columns, "left_anti")
    for c in [f"{prefix}us", *[f"{prefix}{c}" for c in payload]]:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return inner.unionByName(unmatched.select(*inner.columns))
