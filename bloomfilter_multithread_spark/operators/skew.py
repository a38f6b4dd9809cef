"""Key-skew profiler — the diagnostic that makes "skew handled
explicitly" (north rule) operational rather than aspirational.

Before shuffling 100 TB on a key, you want three numbers: how hot is
the hottest key relative to the mean (``skew_ratio_bp``), how lopsided
do the shuffle's hash buckets get (``max_bucket_share_bp``), and how
many salts would flatten the hottest key to a single bucket's fair
share (``salt_hint`` — the factor ``operators/build.py``'s salted build
takes). This operator computes all three plus the top-k hottest keys in
ONE key-count aggregate: everything downstream of the first
``groupBy(key)`` operates on |keys| count rows, never data rows, and
the two summary frames ride along as 1-row broadcast cross joins.

All outputs are exact integers (counts, integer-division basis points),
so the DuckDB mirror is hash-exact. The hash-bucket simulation uses the
md5-prefix bucket both engines compute identically (the
``operators/sampling.py`` trick) — it predicts the shape of ANY
uniform hash partitioning, not Spark's specific murmur3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(col: str, n_buckets: int) -> F.Column:
    return (F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long")
            % n_buckets)


def skew_profile(df: DataFrame, key_col: str, top_k: int = 20,
                 n_buckets: int = 32) -> DataFrame:
    """Profile the distribution of ``key_col``. Returns the ``top_k``
    hottest keys, each row also carrying the corpus-level summary:

      key, n_rows_key, rank, share_bp,          -- per hot key
      n_rows, n_keys,                           -- corpus
      skew_ratio_bp   = 1e4 * max_key / mean_key  (1e4 = perfectly even)
      max_bucket_share_bp = 1e4 * hottest-of-n_buckets hash buckets
      salt_hint       = ceil(max_key * n_buckets / n_rows) — the salt
                        factor that spreads the hottest key across
                        enough buckets to hold its fair share
    """
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    counts = keyed.groupBy("key").agg(F.count("*").cast("long").alias("n_rows_key"))
    summary = counts.agg(
        F.sum("n_rows_key").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("n_rows_key").cast("long").alias("_max_n"),
    )
    buckets = (
        counts.groupBy(_md5_bucket("key", n_buckets).alias("_b"))
        .agg(F.sum("n_rows_key").alias("_bn"))
        .agg(F.max("_bn").cast("long").alias("_max_bucket"))
    )
    top = (
        counts.orderBy(F.desc("n_rows_key"), F.asc("key"))
        .limit(top_k)
        .withColumn(
            "rank",
            # window over the already-limited top_k rows — single tiny
            # partition by construction, not a global sort of all keys
            F.row_number()
            .over(Window.orderBy(F.desc("n_rows_key"), F.asc("key")))
            .cast("int"),
        )
    )
    return (
        top.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(buckets))
        .select(
            "key",
            "n_rows_key",
            "rank",
            F.expr("(10000 * n_rows_key) div n_rows").alias("share_bp"),
            "n_rows",
            "n_keys",
            F.expr("(10000 * _max_n * n_keys) div n_rows").alias("skew_ratio_bp"),
            F.expr("(10000 * _max_bucket) div n_rows").alias("max_bucket_share_bp"),
            F.expr(f"(_max_n * {n_buckets} + n_rows - 1) div n_rows").alias("salt_hint"),
        )
    )


def duckdb_skew_sql(table: str, key_col: str, top_k: int = 20,
                    n_buckets: int = 32) -> str:
    """Hash-exact mirror of :func:`skew_profile` (same md5 bucket, same
    integer divisions, same (count desc, key asc) tie-break)."""
    return f"""
        WITH counts AS (
            SELECT CAST({key_col} AS VARCHAR) AS key,
                   CAST(COUNT(*) AS BIGINT) AS n_rows_key
            FROM {table} GROUP BY 1
        ),
        summary AS (
            SELECT CAST(SUM(n_rows_key) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(n_rows_key) AS BIGINT) AS max_n
            FROM counts
        ),
        buckets AS (
            SELECT CAST(MAX(bn) AS BIGINT) AS max_bucket FROM (
                SELECT SUM(n_rows_key) AS bn FROM counts
                GROUP BY ('0x' || substr(md5(key), 1, 8))::BIGINT % {n_buckets})
        ),
        top AS (
            SELECT key, n_rows_key,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_rows_key DESC, key) AS INTEGER)
                       AS rank
            FROM counts ORDER BY n_rows_key DESC, key LIMIT {top_k}
        )
        SELECT t.key, t.n_rows_key, t.rank,
               (10000 * t.n_rows_key) // s.n_rows AS share_bp,
               s.n_rows, s.n_keys,
               (10000 * s.max_n * s.n_keys) // s.n_rows AS skew_ratio_bp,
               (10000 * b.max_bucket) // s.n_rows AS max_bucket_share_bp,
               (s.max_n * {n_buckets} + s.n_rows - 1) // s.n_rows AS salt_hint
        FROM top t CROSS JOIN summary s CROSS JOIN buckets b
    """
