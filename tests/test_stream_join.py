"""Watermarked stream-stream time-band join — streaming/joins.py.

The contract query (stream_join_errors) proves batch-equality of the
join semantics; these tests pin the STREAMING-specific behavior: exact
equality in the in-order case, and watermark-driven late-row dropping
(the mechanism that bounds join state at scale) in the out-of-order
case.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bloomfilter_multithread_spark.streaming.joins import stream_time_band_join
from bloomfilter_multithread_spark.streaming.sketch_stream import read_parquet_stream

BASE = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _ts(sec: int):
    return int((BASE.timestamp() + sec) * 1_000_000)


def _write(path: str, rows: list[tuple[int, int, int]], cols, mtime=None):
    tbl = pa.table(
        {
            cols[0]: pa.array([r[0] for r in rows], pa.int64()),
            cols[1]: pa.array([r[1] for r in rows], pa.int64()),
            cols[2]: pa.array([_ts(r[2]) for r in rows], pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(tbl, path)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def _run_stream_join(spark, td, band=60, delay="0 seconds", max_files=None):
    es = read_parquet_stream(
        spark, f"{td}/errors", schema="user_id long, err_id long, err_ts timestamp",
        max_files_per_trigger=max_files,
    )
    cs = read_parquet_stream(
        spark, f"{td}/clicks", schema="user_id long, click_id long, click_ts timestamp",
        max_files_per_trigger=max_files,
    )
    joined = stream_time_band_join(
        es, cs, "user_id", "err_ts", "click_ts", band_seconds=band, watermark_delay=delay
    )
    q = (
        joined.select("user_id", "err_id", "click_id")
        .writeStream.format("parquet")
        .option("path", f"{td}/out")
        .option("checkpointLocation", f"{td}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema("user_id long, err_id long, click_id long").parquet(f"{td}/out")
    return sorted(tuple(r) for r in out.collect())


def test_stream_equals_batch_in_order(spark, tmp_path):
    td = str(tmp_path)
    os.makedirs(f"{td}/errors"), os.makedirs(f"{td}/clicks")
    errors = [(1, 100, 1000), (1, 101, 2000), (2, 102, 1500)]
    clicks = [
        (1, 200, 950),   # 50 s before err 100 -> pair
        (1, 201, 1990),  # 10 s before err 101 -> pair
        (1, 202, 500),   # too early for any error
        (2, 203, 1460),  # 40 s before err 102 -> pair
        (2, 204, 1501),  # AFTER err 102 -> no pair
    ]
    _write(f"{td}/errors/a.parquet", errors, ("user_id", "err_id", "err_ts"))
    _write(f"{td}/clicks/a.parquet", clicks, ("user_id", "click_id", "click_ts"))
    got = _run_stream_join(spark, td, band=60, delay="1 hours")
    assert got == [(1, 100, 200), (1, 101, 201), (2, 102, 203)]


def test_exclusive_of_future_clicks_and_band_edges(spark, tmp_path):
    td = str(tmp_path)
    os.makedirs(f"{td}/errors"), os.makedirs(f"{td}/clicks")
    _write(f"{td}/errors/a.parquet", [(7, 1, 1000)], ("user_id", "err_id", "err_ts"))
    clicks = [(7, 10, 940), (7, 11, 939), (7, 12, 1000), (7, 13, 1001)]
    _write(f"{td}/clicks/a.parquet", clicks, ("user_id", "click_id", "click_ts"))
    got = _run_stream_join(spark, td, band=60, delay="1 hours")
    # band is inclusive [ts-60, ts]: 940 and 1000 in, 939 and 1001 out
    assert got == [(7, 1, 10), (7, 1, 12)]


def test_watermark_evicts_state_for_late_arrivals(spark, tmp_path):
    """State eviction (the mechanism that bounds join state at scale):
    batch 0 buffers an old click (t=990) alongside recent events whose
    event time pushes the watermark to ~t=99990; at the batch boundary
    clicks older than watermark-band are EVICTED. The matching error
    (t=1000) only arrives in batch 1, finds no state, and pairs with
    nothing — whereas a batch join (or a long-delay stream, see the
    control test) would emit the pair. Note Spark does NOT drop late
    rows that co-arrive in one micro-batch; eviction across batch
    boundaries is the guarantee, and that is what this pins."""
    td = str(tmp_path)
    os.makedirs(f"{td}/errors"), os.makedirs(f"{td}/clicks")
    now = time.time()
    # batch 0: both clicks + the recent error; watermark after batch 0
    # = min(max err_ts, max click_ts) - 0 s ~ t=99990
    _write(f"{td}/clicks/a.parquet", [(1, 200, 99_990), (1, 201, 990)],
           ("user_id", "click_id", "click_ts"), mtime=now - 100)
    _write(f"{td}/errors/a.parquet", [(1, 100, 100_000)],
           ("user_id", "err_id", "err_ts"), mtime=now - 100)
    # batch 1: a neutral on-time error (other user) — state eviction runs
    # at the END of each batch, so this batch is what flushes the old
    # click (watermark 99990 - band) out of the right-side state
    _write(f"{td}/errors/m.parquet", [(2, 150, 100_020)],
           ("user_id", "err_id", "err_ts"), mtime=now - 75)
    # batch 2: the straggler error whose only match was evicted state
    _write(f"{td}/errors/b.parquet", [(1, 101, 1000)],
           ("user_id", "err_id", "err_ts"), mtime=now - 50)
    got = _run_stream_join(spark, td, band=60, delay="0 seconds", max_files=1)
    assert (1, 100, 200) in got  # on-time pair survives
    assert (1, 101, 201) not in got  # straggler's match was evicted


def test_long_delay_keeps_state_for_late_arrivals(spark, tmp_path):
    """Control for the eviction test: identical files, but a watermark
    delay larger than the disorder keeps the old click in state — the
    missing pair above is the watermark's doing, not the join's."""
    td = str(tmp_path)
    os.makedirs(f"{td}/errors"), os.makedirs(f"{td}/clicks")
    now = time.time()
    _write(f"{td}/clicks/a.parquet", [(1, 200, 99_990), (1, 201, 990)],
           ("user_id", "click_id", "click_ts"), mtime=now - 100)
    _write(f"{td}/errors/a.parquet", [(1, 100, 100_000)],
           ("user_id", "err_id", "err_ts"), mtime=now - 100)
    _write(f"{td}/errors/m.parquet", [(2, 150, 100_020)],
           ("user_id", "err_id", "err_ts"), mtime=now - 75)
    _write(f"{td}/errors/b.parquet", [(1, 101, 1000)],
           ("user_id", "err_id", "err_ts"), mtime=now - 50)
    got = _run_stream_join(spark, td, band=60, delay="2 days", max_files=1)
    assert got == [(1, 100, 200), (1, 101, 201)]


# ---------------------------------------- dropDuplicatesWithinWatermark
def _run_stream_dedup(spark, td, delay, max_files=None):
    es = read_parquet_stream(
        spark, f"{td}/in", schema="user_id long, err_id long, err_ts timestamp",
        max_files_per_trigger=max_files,
    )
    q = (
        es.withWatermark("err_ts", delay)
        .dropDuplicatesWithinWatermark(["err_id"])
        .select("err_id")
        .writeStream.format("parquet")
        .option("path", f"{td}/out")
        .option("checkpointLocation", f"{td}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        r["err_id"] for r in spark.read.schema("err_id long").parquet(f"{td}/out").collect()
    )


def test_stream_dedup_drops_within_watermark_duplicates(spark, tmp_path):
    td = str(tmp_path)
    os.makedirs(f"{td}/in")
    now = time.time()
    _write(f"{td}/in/a.parquet", [(1, 7, 1000), (1, 8, 1001)],
           ("user_id", "err_id", "err_ts"), mtime=now - 100)
    # same key again a batch later, still inside the watermark window
    _write(f"{td}/in/b.parquet", [(1, 7, 1002)],
           ("user_id", "err_id", "err_ts"), mtime=now - 50)
    got = _run_stream_dedup(spark, td, delay="1 hours", max_files=1)
    assert got == [7, 8]


def test_stream_dedup_state_eviction_reemits_old_keys(spark, tmp_path):
    """The state-bounding trade-off, pinned honestly: once the watermark
    passes a key's event time its dedup state evicts, so the SAME key
    re-arriving much later is emitted AGAIN — dedup is exact only within
    the watermark window (that bound is what makes the state O(rate x
    delay) instead of O(stream))."""
    td = str(tmp_path)
    os.makedirs(f"{td}/in")
    now = time.time()
    _write(f"{td}/in/a.parquet", [(1, 7, 1000)],
           ("user_id", "err_id", "err_ts"), mtime=now - 100)
    # advance event time far beyond key 7's window (delay 0 s)
    _write(f"{td}/in/m.parquet", [(1, 50, 100_000)],
           ("user_id", "err_id", "err_ts"), mtime=now - 75)
    # key 7 again: state evicted two batches ago -> emitted a second time
    _write(f"{td}/in/b.parquet", [(1, 7, 100_001)],
           ("user_id", "err_id", "err_ts"), mtime=now - 50)
    got = _run_stream_dedup(spark, td, delay="0 seconds", max_files=1)
    assert got == [7, 7, 50]
