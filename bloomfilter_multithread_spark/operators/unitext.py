"""Unicode NFC normalization — the canonicalization pass a multilingual
pipeline runs BEFORE any hash-based operator (dedup, sampling,
decontamination): visually-identical strings with different code-point
sequences ("e" + COMBINING ACUTE vs precomposed "é") hash differently,
so un-normalized corpora silently under-deduplicate.

This is the package's canonical-orientation slot (SURVEY §2 P5 — the
reference canonicalizes k-mers against their reverse complement,
/root/reference/src/SkmerExtractor.cpp:82-90) for MULTILINGUAL text:
map every string to its canonical composed form before hashing, exactly
as `canonical_kmer` does for DNA.

Spark has no built-in unicode-normalize expression, so this is a
legitimate Pandas-UDF use (the Arrow-batched slow path, never row-at-a-
time): one narrow projection, zero exchanges.  The DuckDB oracle's
`nfc_normalize` implements the same Unicode standard algorithm
(utf8proc) as Python's `unicodedata` (agreement pinned in tests across
combining marks, singletons like U+2126 OHM SIGN → Ω, and NFC-invariant
compatibility chars like ﬁ).

The test fixture's text is pure ASCII (NFC-invariant), so the contract
query synthesizes genuinely decomposed strings from a closed-form
formula over doc_id — the same real-bytes-from-a-formula pattern as
``multimodal.synth_real_media`` — and the oracle rebuilds the identical
strings in SQL without ever seeing Spark's output.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nfc_normalize_col", "nfc_stats", "synth_decomposed_text",
           "duckdb_synth_decomposed_sql", "duckdb_nfc_stats_sql"]

# Closed-form synthesis alphabet (shared literal between both engines),
# spelled as explicit escapes so the decomposed forms cannot be silently
# precomposed by an editor: e+U+0301 COMBINING ACUTE composes to U+00E9;
# o+U+0308 COMBINING DIAERESIS composes to U+00F6; U+2126 OHM SIGN and
# U+212B ANGSTROM SIGN are NFC singletons (-> U+03A9 / U+00C5); every
# 5th row is pure ASCII so `changed` carries signal in both directions.
_EACUTE_D = "e\u0301"        # decomposed -> U+00E9 under NFC
_TDIA_D = " o\u0308k "       # decomposed -> U+00F6
_OHM = "\u2126"              # OHM SIGN -> U+03A9 GREEK CAPITAL OMEGA
_ANGSTROM = "\u212b"         # ANGSTROM SIGN -> U+00C5


def _nfc_batch(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def nfc_normalize_col(col: Column | str) -> Column:
    """Arrow-batched NFC normalization (None-safe).  The pandas_udf is
    created lazily so importing this module needs no SparkSession."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pandas_udf(_nfc_batch, "string")(c)


def synth_decomposed_text(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, raw) with deterministically decomposed unicode strings built
    from a closed-form formula over the id — both engines rebuild the
    same strings independently."""
    d = F.col(id_col)
    acc = (
        F.when(d % 3 == 0, F.lit(_EACUTE_D))
        .when(d % 3 == 1, F.lit(_EACUTE_D * 2))
        .otherwise(F.lit(_EACUTE_D * 3))
    )
    sign = F.when(d % 2 == 0, F.lit(_OHM)).otherwise(F.lit(_ANGSTROM))
    uni = F.concat(F.lit("w"), acc, F.lit(_TDIA_D), sign)
    ascii_only = F.concat(F.lit("plain ascii row "), d.cast("string"))
    return df.select(d.alias(id_col),
                     F.when(d % 5 == 0, ascii_only).otherwise(uni).alias("raw"))


def nfc_stats(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "raw") -> DataFrame:
    """Per-row normalization accounting:
    (id, raw_cp, nfc_cp, changed, nfc_digest) — code-point counts before
    and after NFC, whether normalization changed the string, and the md5
    of the canonical form (the hash every downstream dedup/sample
    operator would key on).  One narrow Arrow-batched projection."""
    nfc = nfc_normalize_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("raw_cp"),
        F.length(nfc).cast("long").alias("nfc_cp"),
        (F.col(text_col) != nfc).alias("changed"),
        F.md5(nfc).alias("nfc_digest"),
    )


def duckdb_synth_decomposed_sql(table: str, id_col: str = "doc_id") -> str:
    """SQL twin of :func:`synth_decomposed_text` (UTF-8 literals inline)."""
    return f"""
        SELECT {id_col},
               CASE WHEN {id_col} % 5 = 0
                    THEN 'plain ascii row ' || CAST({id_col} AS VARCHAR)
                    ELSE 'w' ||
                         CASE {id_col} % 3
                              WHEN 0 THEN '{_EACUTE_D}'
                              WHEN 1 THEN '{_EACUTE_D * 2}'
                              ELSE '{_EACUTE_D * 3}' END ||
                         '{_TDIA_D}' ||
                         CASE WHEN {id_col} % 2 = 0
                              THEN '{_OHM}' ELSE '{_ANGSTROM}' END
               END AS raw
        FROM {table}
    """


def duckdb_nfc_stats_sql(table: str, id_col: str = "doc_id") -> str:
    """Exact mirror of synth + :func:`nfc_stats` via ``nfc_normalize``
    (utf8proc — the same Unicode algorithm as Python's unicodedata)."""
    return f"""
        WITH synth AS ({duckdb_synth_decomposed_sql(table, id_col)})
        SELECT {id_col},
               CAST(length(raw) AS BIGINT) AS raw_cp,
               CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_cp,
               raw != nfc_normalize(raw) AS changed,
               md5(nfc_normalize(raw)) AS nfc_digest
        FROM synth
    """
