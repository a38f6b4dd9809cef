"""Iceberg seam smoke test (VERDICT r3 'What's missing' #4).

The engine's design target is Iceberg transcript tables
(BASELINE.json input_hint), but this sandbox ships no Iceberg runtime
jar, so ``sources/io.py`` routes every read/write through one seam that
tries ``format("iceberg")`` and falls back to parquet. These tests keep
that seam from rotting:

- ALWAYS: the fallback path round-trips through the seam (so a refactor
  that breaks the try/except is caught everywhere, not just on Iceberg
  clusters), and attempting a raw iceberg read without the jar fails
  with the expected missing-DataSource error — if that assertion ever
  starts failing because the read SUCCEEDS, the environment gained an
  Iceberg runtime and the skipped test below will activate.
- IF A JAR IS PRESENT (e.g. a real deployment running this suite): the
  seam must take the Iceberg branch for a real catalog table.

To install the runtime on an environment with network access:
    spark-submit --packages \
      org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 ...
plus a catalog conf such as
    spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.local.type=hadoop
    spark.sql.catalog.local.warehouse=/path/to/warehouse
"""

from __future__ import annotations

import pytest

from bloomfilter_multithread_spark.sources.io import read_table, write_table


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def test_seam_parquet_fallback_roundtrip(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS STRING) AS tool")
    path = str(tmp_path / "t")
    write_table(df, path)
    back = read_table(spark, path)
    assert back.count() == 100
    assert set(back.columns) == {"id", "tool"}


def test_raw_iceberg_read_fails_loudly_without_jar(spark, tmp_path):
    """Pin the failure mode the seam's except-branch relies on. If this
    test ever fails because the read WORKS, the environment has an
    Iceberg runtime — enable test_seam_uses_iceberg_when_available."""
    if _iceberg_available(spark):
        pytest.skip("Iceberg runtime present — seam takes the real branch")
    with pytest.raises(Exception) as ei:
        spark.read.format("iceberg").load(str(tmp_path / "nope")).count()
    msg = str(ei.value)
    assert "iceberg" in msg.lower() or "DATA_SOURCE" in msg


def test_seam_uses_iceberg_when_available(spark, tmp_path):
    """Runs only on environments with the runtime jar + a configured
    catalog: the seam must read an actual Iceberg table by name."""
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in this environment "
                    "(install: --packages org.apache.iceberg:"
                    "iceberg-spark-runtime-4.0_2.13:1.10.0)")
    if not spark.conf.get("spark.sql.catalog.local", None):
        pytest.skip("Iceberg jar present but no catalog configured")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.seam_smoke")
    spark.range(10).writeTo("local.seam_smoke.t").createOrReplace()
    assert read_table(spark, "local.seam_smoke.t").count() == 10
