"""Text shingling — the k-mer analog (FIXTURES.md §3), SQL-reproducible.

The reference slides a k-char window over the DNA stream
(/root/reference/src/SkmerExtractor.cpp:65-74); here a turn's shingles are
the k-grams of whitespace-split tokens of ``text`` (default k=5, stride 1),
joined by single spaces.  Turns with < k tokens contribute the whole
(whitespace-normalized) text as one shingle.

Everything is built from JVM ``pyspark.sql.functions`` (split/transform/
slice/array_join) so it stays inside whole-stage codegen AND has an exact
DuckDB SQL equivalent (see ``duckdb_shingles_cte``) for the driver oracle.

Canonical-orientation note: the reference canonicalizes k-mers against
their reverse complement (src/SkmerExtractor.cpp:82-90); for text
transcripts canonicalization is the identity (SURVEY.md §2 P5), with the
whitespace normalization here playing the reference's character-class
filter role (FastaReader.cpp:33-47).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_K = 5


def tokens(col: Column | str) -> Column:
    """Whitespace tokens. The class is spelled explicitly instead of
    ``\\s``: Java's ``\\s`` includes ``\\x0B`` (vertical tab) while
    RE2's (DuckDB's) does not, so ``\\s`` would silently break oracle
    parity on VT-bearing text (ADVICE r4). Every DuckDB mirror in this
    repo splits on the same literal class."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"[ \t\n\x0B\f\r]+")


def normalized_text(col: Column | str) -> Column:
    """Whitespace-normalized text (token join) — the identity-canonical form."""
    return F.array_join(tokens(col), " ")


def shingles(col: Column | str, k: int = DEFAULT_K) -> Column:
    """array<string> of k-gram shingles of ``col`` (whole text if < k tokens)."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (k - 1)),
        lambda i: F.array_join(F.slice(t, i, k), " "),
    )
    return F.when(F.size(t) < k, F.array(normalized_text(col))).otherwise(grams)


def explode_shingles(df, text_col: str = "text", k: int = DEFAULT_K,
                     out_col: str = "shingle"):
    """df -> one row per (original row, shingle)."""
    return df.withColumn(out_col, F.explode(shingles(text_col, k)))


def duckdb_shingles_cte(table: str, id_cols: str, text_col: str = "text",
                        k: int = DEFAULT_K, out: str = "shingle") -> str:
    """DuckDB CTE body producing exactly the same (id_cols, shingle) rows as
    ``explode_shingles`` — the oracle-side mirror. Usage:
    ``WITH sh AS ({duckdb_shingles_cte(...)}) SELECT ...``"""
    return f"""
    SELECT {id_cols},
           CASE WHEN len(t) < {k}
                THEN array_to_string(t, ' ')
                ELSE array_to_string(list_slice(t, i, i + {k - 1}), ' ')
           END AS {out}
    FROM (SELECT {id_cols}, regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+') AS t
          FROM {table}) tok,
         LATERAL (SELECT unnest(generate_series(1, greatest(1, len(t) - {k - 1}))) AS i) g
    """
