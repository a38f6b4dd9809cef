"""Unicode NFC canonicalization — Python/DuckDB algorithm agreement,
composition semantics, and the under-deduplication failure mode it
exists to fix (value-level oracle parity for the contract query is in
tests/test_entry_contract.py)."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.unitext import (
    nfc_normalize_col,
    nfc_stats,
    synth_decomposed_text,
)

# decomposed, singleton, compat-invariant, ascii, empty — explicit
# escapes so an editor cannot silently precompose them
CASES = [
    "we\u0301 o\u0308k",     # combining marks compose -> \u00e9 / \u00f6
    "\u2126 \u212b",          # NFC singletons (OHM, ANGSTROM SIGN)
    "\ufb01n \u00bd",         # fi-ligature and 1/2 are NFC-INVARIANT (compat only)
    "plain ascii",
    "",
]


def test_python_duckdb_nfc_agreement():
    """The two engines implement the same Unicode algorithm — pinned on
    every case class the synthesizer emits."""
    con = duckdb.connect()
    for s in CASES:
        py = unicodedata.normalize("NFC", s)
        db = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert py == db, repr(s)


def test_nfc_composes_and_is_idempotent(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "id long, raw string")
    out = df.select("id", nfc_normalize_col("raw").alias("nfc"))
    rows = {r.id: r.nfc for r in out.collect()}
    assert rows[0] == "w\u00e9 \u00f6k"
    assert rows[1] == "\u03a9 \u00c5"
    assert rows[2] == CASES[2]  # NFC leaves compatibility chars alone
    assert rows[3] == CASES[3] and rows[4] == ""
    # idempotence: normalizing the normalized column is the identity
    twice = out.select("id", nfc_normalize_col("nfc").alias("nfc2"))
    assert {r.id: r.nfc2 for r in twice.collect()} == rows


def test_unnormalized_text_underdeduplicates(spark):
    """The motivating failure: precomposed and decomposed spellings of
    the same word are distinct to md5 until NFC unifies them."""
    df = spark.createDataFrame(
        [(1, "café"), (2, "café")], "id long, raw string"
    )
    raw_digests = df.select(F.md5("raw").alias("h")).distinct().count()
    nfc_digests = (
        df.select(F.md5(nfc_normalize_col("raw")).alias("h")).distinct().count()
    )
    assert raw_digests == 2 and nfc_digests == 1


def test_synth_and_stats_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = nfc_stats(synth_decomposed_text(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        if r.doc_id % 5 == 0:
            assert not r.changed and r.raw_cp == r.nfc_cp
        else:
            assert r.changed and r.nfc_cp < r.raw_cp
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one narrow Arrow-batched projection
    assert "ArrowEvalPython" in plan  # and it IS the arrow path, not row-UDF
