"""PII detection / redaction — regex scrubbing for training-data curation.

A 100 TB pretraining pipeline scrubs personally-identifying strings
before anything else touches the text.  This is a pure narrow map —
no shuffle, whole-stage codegen end to end — so it composes for free
in front of every other operator in this package (dedup, chunking,
quality scoring).

Cross-engine exactness: every pattern below is written in the common
subset of Java regex (Spark) and RE2 (DuckDB) — explicit character
classes only (``[0-9]`` not ``\\d``), no lookaround, no backreferences,
no ``\\b`` — so ``regexp_count`` / ``regexp_replace`` produce identical
matches in both engines and the scrubbed text is bit-identical
(witnessed by an md5 over the redacted text in the contract query).

Redaction applies the patterns in the fixed order of ``PII_SPECS``;
order matters when matches could nest (an email's host part must be
consumed before the IPv4 pass sees it), so the oracle mirrors the same
order.

Scale note: ``regexp_count``/``regexp_replace`` are JVM codegen
expressions; per-row cost is O(len(text) x patterns) with zero exchange
— the plan survives any scale-up untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — patterns valid and identical under
# Java regex AND RE2 (see module docstring).
PII_SPECS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", "[+][0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
]


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds one ``n_<name>`` long column per PII pattern (match count)."""
    out = df
    for name, pattern, _ in PII_SPECS:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pattern)).cast("long"),
        )
    return out


def redacted(text_col: str = "text") -> Column:
    """The text with every PII match replaced, patterns applied in
    ``PII_SPECS`` order (single codegen'd expression chain)."""
    c: Column = F.col(text_col)
    for _, pattern, repl in PII_SPECS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "redacted") -> DataFrame:
    return df.withColumn(out_col, redacted(text_col))


def duckdb_pii_exprs(text_expr: str) -> tuple[list[str], str]:
    """(count SQL expressions, redacted SQL expression) mirroring
    ``with_pii_counts`` / ``redacted`` exactly (same patterns, same
    order; RE2 needs the explicit 'g' flag to replace all)."""
    counts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{p}')) AS BIGINT) AS n_{name}"
        for name, p, _ in PII_SPECS
    ]
    red = text_expr
    for _, p, repl in PII_SPECS:
        red = f"regexp_replace({red}, '{p}', '{repl}', 'g')"
    return counts, red
