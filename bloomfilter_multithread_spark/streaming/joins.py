"""Watermarked stream-stream time-band join.

The last streaming-surface shape the engine lacked (SURVEY §2.2
streaming): correlating two live event streams — here "find the clicks
that preceded each error by ≤ band seconds for the same user", i.e. the
streaming twin of ``operators/rangejoin.band_join`` and the alignment
shape of ``operators/asof.asof_join``.

State-bound story (what watermarks buy at scale): an unbounded
stream-stream join must buffer EVERY past row of both sides. With
``withWatermark(delay)`` on both sides AND a time-band join condition,
Spark derives the state-eviction bound — each side retains only rows
within (watermark - band), so state is O(input_rate x (band + delay)),
independent of stream length. That is the only join shape that survives
an unbounded 10^12-turn stream.

Correctness vs batch: with event-time data processed while watermarks
lag the buffered rows (single AvailableNow batch, or in-order files),
the streamed result equals the batch inequality join row-for-row —
gated by the ``stream_join_errors`` contract query (batch SQL oracle)
and by tests/test_stream_join.py. Eviction semantics (measured, and
pinned by tests): Spark removes out-of-window state at the END of each
micro-batch, so a straggler still matches state from the immediately
preceding batch and loses its match only from two-plus batches back;
late rows that co-arrive in ONE micro-batch always join. Results are
therefore a watermark-bounded SUBSET of the batch join, never wrong
pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_time_band_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Inner-join two STREAMING DataFrames on ``key`` where
    ``right_ts ∈ [left_ts - band_seconds, left_ts]`` (right event at or
    before the left event, within the band).

    Both inputs must carry event-time columns; both get a watermark so
    the join state is evictable (see module docstring). Column names of
    the two sides must not collide apart from ``key``.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {band_seconds} SECONDS"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
