"""Table IO + session helpers.

The design target is Iceberg transcript tables (BASELINE.json input_hint);
this sandbox has no Iceberg runtime jar, so every read/write goes through
one seam that tries ``format("iceberg")`` and falls back to parquet
(SURVEY.md §7 hard part d).  Replaces the reference's character-stream
FASTA scan (/root/reference/src/FastaReader.cpp:25-49) with columnar
vectorized parquet scans that Catalyst can push filters/pruning into.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(app: str = "bloomfilter-multithread-spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None,
              driver_memory: str | None = None) -> SparkSession:
    """Session tuned for the sketch workload: AQE on (runtime coalesce +
    skew-join splitting), Arrow enabled for pandas/Arrow UDF transfer."""
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS",
                                                         DEFAULT_SHUFFLE_PARTITIONS))),
        )
        .config("spark.driver.memory",
                driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def read_table(spark: SparkSession, path_or_name: str, table: str | None = None) -> DataFrame:
    """Read an Iceberg table by name, or ``<dir>/<table>.parquet``.

    ``read_table(spark, sf_dir, "lineitem")`` is the driver-testdata form.
    """
    if table is not None:
        pq = os.path.join(path_or_name, f"{table}.parquet")
        if os.path.exists(pq):
            return spark.read.parquet(pq)
        path_or_name = f"{path_or_name}.{table}" if "." not in table else table
    try:
        return spark.read.format("iceberg").load(path_or_name)
    except Exception:
        return spark.read.parquet(path_or_name)


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    try:
        w.format("iceberg").save(path)
    except Exception:
        w.parquet(path)
