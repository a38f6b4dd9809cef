"""As-of (most-recent-prior) join — align each probe row with the latest
reference row at or before its timestamp, per key.

The reference engine's probe answers "was this item EVER seen"
(``src/SkmerSplitter.cpp:130-137``); the as-of join is its
temporally-ordered generalization — "what was the latest state WHEN this
row happened" — and the workhorse of transcript/event alignment in a
training-data pipeline (attach the latest tool result to each model turn,
the latest page view to each click, the latest config to each run).

Spark-first implementation: the UNION + running-``last`` trick, not a
range join —

    tag probe rows 0 and reference rows 1, union them, and take
    ``last(ref payload, ignorenulls)`` over a per-key window ordered by
    (ts, tag DESC, tiebreak) from the partition start to the current row.

One shuffle on the key (the window's ``hashpartitioning``), zero row
explosion, no inequality-join fallback to BroadcastNestedLoopJoin — the
shape survives 100 TB because cost is a sort within each key partition,
exactly what a time-series table is usually already clustered by. The
inequality formulation (``l.ts >= r.ts`` + argmax) would be a quadratic
physical join in Spark; DuckDB's native ``ASOF JOIN`` (the oracle) does
the same merge internally.

Tie semantics: ordering by (ts ASC, tag DESC, tiebreak ASC) makes a
reference row at exactly the probe's timestamp visible to it (inclusive
``>=``, matching DuckDB ASOF). Among reference rows sharing (key, ts) the
LAST in tiebreak order wins; pass ``tiebreak`` (e.g. an event id) or
pre-dedup to make that deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    payload: Sequence[str] = ("event_id",),
    tiebreak: str | None = None,
    tolerance: Column | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every ``probe`` row, attach the payload columns of the latest
    ``ref`` row with the same ``on`` key and ``ref.ts <= probe.ts``
    (NULLs when no such row, left-join semantics).

    tolerance : optional Column (e.g. ``F.expr("INTERVAL 5 MINUTES")``);
        matches staler than ``probe.ts - tolerance`` are nulled out —
        the ``pandas.merge_asof(tolerance=...)`` semantics.
    Returns ``probe``'s columns plus ``{prefix}{col}`` for each payload
    column and ``{prefix}ts`` (the matched reference timestamp).
    """
    pay = list(dict.fromkeys([*payload]))
    probe_cols = probe.columns
    tagged_p = probe.withColumn("_tag", F.lit(0))
    for c in [*pay, f"_r_{ts}"]:
        tagged_p = tagged_p.withColumn(f"_r_{c}" if not c.startswith("_r_") else c,
                                       F.lit(None))
    tagged_r = ref.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in pay],
        F.col(ts).alias(f"_r_{ts}"),
    )
    for c in probe_cols:
        if c not in (on, ts):
            tagged_r = tagged_r.withColumn(c, F.lit(None))
    u = tagged_p.select(
        on, ts, "_tag", *[c for c in probe_cols if c not in (on, ts)],
        *[f"_r_{c}" for c in pay], f"_r_{ts}",
    ).unionByName(tagged_r.select(
        on, ts, "_tag", *[c for c in probe_cols if c not in (on, ts)],
        *[f"_r_{c}" for c in pay], f"_r_{ts}",
    ))

    order = [F.col(ts).asc(), F.col("_tag").desc()]
    if tiebreak is not None:
        # probe rows carry NULL in _r_<tiebreak>; nulls_first keeps them
        # ordered stably among themselves without affecting ref ordering
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in [*pay, ts]:
        out = out.withColumn(
            f"{prefix}{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w)
        )
    out = out.where(F.col("_tag") == 0)
    if tolerance is not None:
        fresh = F.col(f"{prefix}{ts}") >= F.col(ts) - tolerance
        for c in [*pay, ts]:
            out = out.withColumn(
                f"{prefix}{c}", F.when(fresh, F.col(f"{prefix}{c}"))
            )
    return out.select(*probe_cols, *[f"{prefix}{c}" for c in [*pay, ts]])
