"""Sharded export manifest: round-trip parity, checksum semantics,
assignment determinism, DuckDB mirror parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.export import (
    duckdb_manifest_sql,
    export_shards,
    shard_manifest,
)


def _docs(spark, rows=None):
    rows = rows if rows is not None else [
        (i, f"doc {i} body word{i % 3} tail") for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_roundtrip_manifest_matches_oracle(spark, tmp_path):
    df = _docs(spark)
    m = export_shards(spark, df, str(tmp_path / "shards"), n_shards=4)
    got = sorted(tuple(r) for r in m.collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = sorted(
        tuple(r) for r in
        con.sql(duckdb_manifest_sql("documents", n_shards=4)).fetchall()
    )
    assert got == want
    assert sum(r[1] for r in got) == 40  # every doc in exactly one shard


def test_checksum_is_order_free_but_duplicate_sensitive(spark):
    rows = [(1, "alpha beta"), (2, "gamma"), (3, "delta eps")]
    one = shard_manifest(
        _docs(spark, rows).withColumn("shard_id", F.lit(0))
    ).collect()[0]
    rev = shard_manifest(
        _docs(spark, rows[::-1]).withColumn("shard_id", F.lit(0))
    ).collect()[0]
    assert one.checksum == rev.checksum  # order-independent
    dup = shard_manifest(
        _docs(spark, rows + [rows[0]]).withColumn("shard_id", F.lit(0))
    ).collect()[0]
    assert dup.checksum != one.checksum  # XOR would cancel; sum must not


def test_shard_assignment_is_partitioning_invariant(spark, tmp_path):
    df = _docs(spark)
    a = export_shards(spark, df, str(tmp_path / "a"), n_shards=4)
    b = export_shards(spark, df.repartition(7), str(tmp_path / "b"), n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_checksum_matches_python_model_on_random_docs(spark):
    """Hypothesis-style randomized cross-check of the decimal-sum
    modular arithmetic against a pure-Python big-int model (Spark's
    decimal(38,0) sum and the 2^62 modulo must agree with unbounded
    ints for any row set)."""
    import hashlib
    import random

    from bloomfilter_multithread_spark.operators.export import (
        CHECKSUM_HEX_DIGITS,
        CHECKSUM_MOD,
    )

    rng = random.Random(7)
    for trial in range(3):
        rows = [
            (rng.randrange(10**12), "w" + str(rng.randrange(10**6)) + " body")
            for _ in range(rng.randrange(1, 60))
        ]
        want = sum(
            int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:CHECKSUM_HEX_DIGITS], 16)
            for i, t in rows
        ) % CHECKSUM_MOD
        got = shard_manifest(
            _docs(spark, rows).withColumn("shard_id", F.lit(0))
        ).collect()[0].checksum
        assert got == want, f"trial {trial}"


def test_manifest_token_parity_on_vertical_tab(spark, tmp_path):
    """Java's \\s includes \\x0B while RE2's does not (ADVICE r4) — both
    engines now split on the explicit class [ \\t\\n\\x0B\\f\\r]+, so
    VT-bearing text must produce IDENTICAL sum_tokens, not a spurious
    'corruption' mismatch. This plants every divergence-prone char."""
    rows = [
        (1, "alpha\x0bbeta gamma"),        # VT joins in RE2 \s+? now splits both
        (2, "a\tb\nc\fd\re f"),            # every other class member
        (3, "\x0b lead and trail \x0b"),   # VT at trim boundaries
        (4, "plain words here"),
    ]
    df = _docs(spark, rows)
    m = export_shards(spark, df, str(tmp_path / "vt"), n_shards=2)
    got = sorted(tuple(r) for r in m.collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = sorted(
        tuple(r) for r in
        con.sql(duckdb_manifest_sql("documents", n_shards=2)).fetchall()
    )
    assert got == want
