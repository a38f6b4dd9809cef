"""Z-order (Morton) data layout — multi-dimensional clustering for
min-max pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file skipping works off per-file min/max statistics,
which a single-column sort optimizes for ONE predicate column only.
Interleaving the bits of k normalized columns (the Morton / Z-order
curve, the technique Delta Lake's OPTIMIZE ZORDER popularized — public
algorithm, Morton 1966) makes files tight in EVERY interleaved
dimension at once: a range predicate on any of them touches a strict
subset of files.

Everything here is exact integer bit arithmetic (shift/and/or on
longs), so the z-value computation is hash-exact mirrorable in SQL —
``zorder_values`` gates it. The layout BENEFIT (fewer files read) is
pinned by tests/test_layout.py: the same range predicate touches fewer
files under z-order than under a single-column sort of the other
column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 10) -> Column:
    """Morton-interleave ``bits`` low bits of each column (values must
    already be normalized to [0, 2^bits) longs — callers bucket/clamp).
    For k columns, output bit (i*k + j) = bit i of column j; total
    k*bits bits (keep k*bits <= 62)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError("k*bits must fit a signed 64-bit value")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                            i * k + j)
            )
    return z


def duckdb_zorder_expr(cols: list[str], bits: int = 10) -> str:
    """SQL mirror of :func:`zorder_key` (same bit placement; `>>`/`&`/
    `|` on BIGINT are exact in both engines)."""
    k = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " | ".join(terms) + " AS BIGINT)"


def write_zordered(df: DataFrame, path: str, zcol: Column, n_files: int) -> None:
    """Cluster rows by z-value into ``n_files`` output files:
    ``repartitionByRange`` on the z key gives contiguous z-ranges per
    file (range partitioning samples quantiles — one extra pass), then a
    within-partition sort tightens per-row-group min/max too."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_encode(vals: list[int], bits: int) -> int:
    """Pure-python reference of :func:`zorder_key` for one point (tests
    pin the Spark/SQL forms equal to this)."""
    k = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


def morton_decode(z: int, k: int, bits: int) -> list[int]:
    """Inverse of :func:`morton_encode` — recover the k normalized
    coordinates from a z-value (useful for debugging file ranges:
    a file's min/max z decode to the corner coordinates of its
    covering region)."""
    vals = [0] * k
    for i in range(bits):
        for j in range(k):
            vals[j] |= ((z >> (i * k + j)) & 1) << i
    return vals


# ---------------------------------------------------------------------------
# small-file compaction — output-layout maintenance
# ---------------------------------------------------------------------------

def dir_parquet_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory — driver-side
    filesystem metadata only, no Spark job."""
    import os

    files = [
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_files(spark, src_dir: str, dst_dir: str,
                  target_file_bytes: int = 128 << 20,
                  sort_key: str | None = None) -> dict:
    """Rewrite a directory of small parquet files to ~``target_file_bytes``
    files — the other 100-TB layout chore next to z-ordering: every
    incremental writer (streaming epochs, checkpoint state, per-task
    sinks) fragments storage, and scan cost grows with file COUNT
    (footer reads, task scheduling), not just bytes. Reference analog:
    the per-worker text sink K1 (/root/reference/src/SkmerSplitter.cpp:
    15-59) writes one file per worker — exactly the small-files problem
    at q workers.

    The output file count is sized from the SOURCE's on-disk bytes
    (driver-side metadata, no extra pass — the same sizing
    ``spark.sql.files.maxPartitionBytes`` uses for scan splits).
    With ``sort_key`` the rewrite goes through ``repartitionByRange`` +
    ``sortWithinPartitions`` on that key, PRESERVING an existing
    clustering/z-order (disjoint per-file key ranges, so min-max file
    skipping keeps working); without it, ``coalesce`` concatenates
    partitions with NO shuffle at all.

    Returns driver-side stats:
    ``{n_files_before, n_files_after, n_files_target, bytes_before,
    bytes_after, rows}``."""
    import math

    n_before, bytes_before = dir_parquet_stats(src_dir)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if sort_key is not None:
        out = df.repartitionByRange(n_out, sort_key).sortWithinPartitions(sort_key)
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    n_after, bytes_after = dir_parquet_stats(dst_dir)
    rows = spark.read.parquet(dst_dir).count()
    return {
        "n_files_before": n_before,
        "n_files_after": n_after,
        "n_files_target": n_out,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "rows": rows,
    }
