"""Exact duplicated-substring span detection — the ExactSubstr side of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), which their suffix-array tool implements single-node.

The Spark-first re-expression trades the suffix array for the standard
distributed equivalent: a duplicated substring of >= k tokens contains a
duplicated k-token gram at every offset, so marking every position whose
k-gram occurs more than once anywhere in the corpus and merging the
overlapping [s, s+k-1] intervals recovers exactly the maximal duplicated
spans down to k-token resolution.  Three shuffles, all on compact keys:

  1. groupBy(md5(gram))      — dup detection; the digest is computed
                               BEFORE the exchange, so no gram text ever
                               crosses the wire (plan-asserted);
  2. left-semi join on digest — keep only positions inside dup grams;
  3. window by (doc, start)  — per-doc interval merge (gaps-and-islands:
                               all intervals have length k, so an island
                               breaks exactly when s > max(prev s)+k-1).

Everything downstream of tokenization is integer arithmetic, so the
DuckDB oracle reproduces every value bit-for-bit.

Reference lineage: the per-position k-window enumeration is the
reference's k-mer extraction loop
(/root/reference/src/SkmerSplitter.cpp:81-84); the dup-position marking
is its membership probe turned into a self-membership test.  Sibling
operators: ``dedup.dupngram_fraction`` (the same paper's approximate
MEASURE) and ``dedup.line_dedup_stats`` (C4's line-level variant); this
one produces the span geometry a rewrite pass would cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.shingles import tokens

__all__ = ["dup_span_stats", "duckdb_dup_span_sql"]


def dup_span_stats(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 10) -> DataFrame:
    """Per-doc duplicated-span geometry:
    (id, n_tokens, n_dup_spans, n_covered_tokens, keep_frac_bp).

    ``n_covered_tokens`` is the size of the union of all [s, s+k-1] token
    intervals whose k-gram occurs > 1 time corpus-wide (within-doc repeats
    count, as in Lee et al.); ``keep_frac_bp`` is the surviving fraction
    in integer basis points.  Docs with < k tokens have no grams and keep
    10000 bp."""
    t = tokens(text_col)
    grams = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (k - 1)),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    per_doc = df.select(F.col(id_col), F.size(t).cast("long").alias("n_tokens"))
    g = (
        df.select(F.col(id_col), F.posexplode(grams).alias("s", "_g"))
        .select(id_col, "s", F.md5("_g").alias("h"))  # digest before exchange
    )
    dup_h = g.groupBy("h").agg(F.count("*").alias("c")).where("c > 1").select("h")
    hits = g.join(dup_h, "h", "left_semi").select(id_col, "s")

    w_prev = (
        Window.partitionBy(id_col).orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col).orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_s = F.max("s").over(w_prev)
    brk = F.when(
        prev_max_s.isNull() | (F.col("s") > prev_max_s + F.lit(k - 1)), 1
    ).otherwise(0)
    islands = hits.withColumn("island", F.sum(brk).over(w_run))
    spans = islands.groupBy(id_col, "island").agg(
        (F.max("s") - F.min("s") + F.lit(k)).cast("long").alias("covered")
    )
    agg = spans.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum("covered").cast("long").alias("n_covered_tokens"),
    )
    return (
        per_doc.join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("n_covered_tokens", F.lit(0)).cast("long")
            .alias("n_covered_tokens"),
            F.expr(
                "(n_tokens - coalesce(n_covered_tokens, 0L)) * 10000L div n_tokens"
            ).alias("keep_frac_bp"),
        )
    )


def duckdb_dup_span_sql(table: str, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 10) -> str:
    """Exact mirror: same strict k-grams, md5 dup test, fixed-length
    gaps-and-islands merge, integer basis points."""
    return f"""
        WITH base AS (
            SELECT {id_col}, regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+') AS t
            FROM {table}
        ),
        tokc AS (SELECT {id_col}, CAST(len(t) AS BIGINT) AS n_tokens FROM base),
        g AS (
            SELECT {id_col}, i - 1 AS s,
                   md5(array_to_string(list_slice(t, i, i + {k - 1}), ' ')) AS h
            FROM base,
                 LATERAL (SELECT unnest(generate_series(1, len(t) - {k - 1})) AS i) ix
            WHERE len(t) >= {k}
        ),
        dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) > 1),
        hits AS (SELECT {id_col}, s FROM g WHERE h IN (SELECT h FROM dup)),
        isl AS (
            SELECT {id_col}, s,
                   CASE WHEN MAX(s) OVER w IS NULL
                             OR s > MAX(s) OVER w + {k - 1}
                        THEN 1 ELSE 0 END AS brk
            FROM hits
            WINDOW w AS (PARTITION BY {id_col} ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        isl2 AS (
            SELECT {id_col}, s,
                   SUM(brk) OVER (PARTITION BY {id_col} ORDER BY s
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM isl
        ),
        spans AS (
            SELECT {id_col}, island,
                   CAST(MAX(s) - MIN(s) + {k} AS BIGINT) AS covered
            FROM isl2 GROUP BY {id_col}, island
        ),
        perdoc AS (
            SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                   CAST(SUM(covered) AS BIGINT) AS n_covered_tokens
            FROM spans GROUP BY {id_col}
        )
        SELECT t.{id_col}, t.n_tokens,
               COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
               COALESCE(p.n_covered_tokens, 0) AS n_covered_tokens,
               CAST((t.n_tokens - COALESCE(p.n_covered_tokens, 0)) * 10000
                    // t.n_tokens AS BIGINT) AS keep_frac_bp
        FROM tokc t LEFT JOIN perdoc p USING ({id_col})
    """
