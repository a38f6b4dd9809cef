"""Model-based data selection — the filtering stage between dedup and
training that decides WHICH surviving documents are worth tokens.

Three standard selectors, each the Spark-first re-expression of a
published pipeline stage, all hash-exact against a DuckDB mirror:

* :func:`hashed_classifier_scores` — a fastText-style hashed linear
  bag-of-words classifier (CCNet / GPT-3 "quality classifier" stage).
  Tokens hash into a fixed number of weight buckets, the doc score is
  the integer sum of its tokens' bucket weights.  The bucket table is
  FIXED-SIZE (``n_buckets`` rows, independent of corpus size), so the
  100-TB-correct join is a broadcast — the opposite call from
  ``unigram_nll_scores``' open-vocabulary tf⋈counts shuffle join, and
  the tests pin both shapes.
* :func:`dsir_weights` — Data Selection via Importance Resampling
  (Xie et al., 2023): hashed uni+bigram features, per-bucket
  log-likelihood-ratio of a target slice vs the raw corpus, per-doc
  importance weight = integer sum of its features' micro-rounded
  log-ratios, and a deterministic top-fraction selection via
  :func:`..operators.ranking.global_rank` (no Exchange
  SinglePartition).
* :func:`token_entropy` — token-distribution Shannon entropy as a
  repetition/diversity signal (low entropy = TEMPLATE/SPAM-like doc).
  Implemented entirely with higher-order array functions
  (transform/filter/aggregate) so the whole operator is ONE narrow
  whole-stage-codegen map — ZERO exchanges, asserted in tests.

Reference lineage: the weight/ratio lookup over a fixed hash space is
the reference's k-mer → Bloom-position mapping
(/root/reference/src/SkmerSplitter.cpp:91-120 — fixed-size table
addressed by a token hash) repurposed as a learned table; the
fixed-point micro-rounding discipline is the package-wide idiom
(operators/textstats.py BM25/NLL) so the DuckDB oracle can reproduce
every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.shingles import tokens
from .dedup import md5_hash_col
from .ranking import global_rank

__all__ = [
    "hashed_classifier_scores",
    "seeded_weights",
    "dsir_weights",
    "token_entropy",
    "duckdb_classifier_sql",
    "duckdb_dsir_sql",
    "duckdb_token_entropy_sql",
]


# ---------------------------------------------------------------------------
# fastText-style hashed linear classifier
# ---------------------------------------------------------------------------

def _bucket(col: Column, n_buckets: int, salt: str) -> Column:
    """Token -> weight-bucket id in [0, n_buckets) via the md5-prefix
    integer (cross-engine-mirrorable, see ``dedup.md5_hash_col``)."""
    return md5_hash_col(F.concat(col, F.lit(salt))) % F.lit(n_buckets)


def seeded_weights(spark, n_buckets: int = 4096, salt: str = "qw",
                   span: int = 2001) -> DataFrame:
    """Deterministic stand-in weight table: bucket b -> integer weight in
    [-(span//2), span//2], derived from md5(b||salt).  In production this
    table comes from training; the OPERATOR below is agnostic — any
    (bucket, weight) frame with the same schema plugs in."""
    half = span // 2
    return spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (md5_hash_col(F.concat(F.col("id").cast("string"), F.lit(salt)))
         % F.lit(span) - F.lit(half)).cast("long").alias("weight"),
    )


def hashed_classifier_scores(df: DataFrame, weights: DataFrame,
                             id_col: str = "doc_id", text_col: str = "text",
                             n_buckets: int = 4096,
                             salt: str = "qw") -> DataFrame:
    """Per-doc linear score under a hashed bag-of-words model:
    (id, n_tokens, score, keep) with ``score = Σ_tok weight[bucket(tok)]``
    (with multiplicity) and ``keep = score >= 0``.

    Shape: explode tokens (narrow) → BROADCAST join the fixed-size bucket
    table → one groupBy(id) shuffle.  The exchange carries
    (id, weight:int64) only — no token strings cross the wire."""
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("_tok"),
    ).select(id_col, _bucket(F.col("_tok"), n_buckets, salt).alias("bucket"))
    return (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("weight").cast("long").alias("score"),
        )
        .select(id_col, "n_tokens", "score", (F.col("score") >= 0).alias("keep"))
    )


def duckdb_classifier_sql(table: str, id_col: str = "doc_id",
                          text_col: str = "text", n_buckets: int = 4096,
                          salt: str = "qw", span: int = 2001) -> str:
    """Exact mirror: same md5-prefix bucket/weight derivations, integer sum."""
    half = span // 2
    return f"""
        WITH tok AS (
            SELECT {id_col},
                   ('0x' || substr(md5(t || '{salt}'), 1, 8))::BIGINT
                     % {n_buckets} AS bucket
            FROM (SELECT {id_col},
                         unnest(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS t
                  FROM {table})
        ),
        w AS (
            SELECT b AS bucket,
                   ('0x' || substr(md5(CAST(b AS VARCHAR) || '{salt}'), 1, 8))::BIGINT
                     % {span} - {half} AS weight
            FROM (SELECT unnest(generate_series(0, {n_buckets - 1})) AS b)
        )
        SELECT {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(weight) AS BIGINT) AS score,
               SUM(weight) >= 0 AS keep
        FROM tok JOIN w USING (bucket)
        GROUP BY {id_col}
    """


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

def _uni_bi_grams(text_col: str) -> Column:
    """array<string> of unigrams + space-joined bigrams (strict: docs with
    < 2 tokens contribute unigrams only)."""
    t = tokens(text_col)
    bi = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.array_join(F.slice(t, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bi)


def dsir_weights(df: DataFrame, target_pred: Column | str,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 1024, salt: str = "dsir",
                 keep_frac: float = 0.25) -> DataFrame:
    """DSIR (Xie et al., 2023) importance weights + deterministic
    top-``keep_frac`` selection.

    Features are hashed uni+bigrams into ``n_buckets``; for each bucket
    the log-likelihood ratio of the TARGET slice (rows matching
    ``target_pred``) vs the RAW corpus is

        lr(b) = log2((ct(b)+1)/(Tt+B)) - log2((cr(b)+1)/(Tr+B)),

    micro-rounded to an integer once per bucket; a doc's importance
    weight is the exact integer sum of its feature occurrences' lr_micro.
    Selection: ``global_rank`` on (-weight, id) — distributed order
    statistics, no Exchange SinglePartition — keeps the top
    ``floor(keep_frac * N)`` docs.

    Returns (id, n_feats, dsir_micro, selected).

    Scale shape: one groupBy(bucket) pass computes BOTH distributions
    (sum + conditional sum); the B-row ratio table broadcasts; the only
    data-sized shuffles are groupBy(id, bucket) tf and the rank's range
    exchange.  Tt/Tr are driver scalars (sanctioned scalar collect)."""
    pred = F.expr(target_pred) if isinstance(target_pred, str) else target_pred
    feats = df.select(
        F.col(id_col),
        pred.alias("_is_target"),
        F.explode(_uni_bi_grams(text_col)).alias("_g"),
    ).select(
        id_col, "_is_target",
        _bucket(F.col("_g"), n_buckets, salt).alias("bucket"),
    )
    per_bucket = feats.groupBy("bucket").agg(
        F.count("*").cast("long").alias("cr"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).cast("long").alias("ct"),
    )
    totals = per_bucket.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    ).collect()[0]
    t_raw, t_tgt = int(totals["tr"]), int(totals["tt"])
    lr = (
        F.log2(F.col("ct") + F.lit(1.0)) - F.log2(F.lit(float(t_tgt + n_buckets)))
        - F.log2(F.col("cr") + F.lit(1.0)) + F.log2(F.lit(float(t_raw + n_buckets)))
    )
    ratio = per_bucket.select(
        "bucket",
        F.floor(lr * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lr_micro"),
    )
    doc_w = (
        feats.groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("tf"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_feats"),
            F.sum(F.col("tf") * F.col("lr_micro")).cast("long").alias("dsir_micro"),
        )
    )
    n_docs = df.count()
    n_keep = int(keep_frac * n_docs)
    ranked = global_rank(
        doc_w.withColumn("_neg_w", -F.col("dsir_micro")),
        ["_neg_w", id_col], rank_col="_r",
    )
    return ranked.select(
        id_col, "n_feats", "dsir_micro",
        (F.col("_r") < F.lit(n_keep)).alias("selected"),
    )


def duckdb_dsir_sql(table: str, target_pred: str, id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 1024,
                    salt: str = "dsir", keep_frac: float = 0.25) -> str:
    """Exact mirror: same grams, buckets, smoothing, per-bucket micro
    rounding, integer weight sum, and ROW_NUMBER-based top-fraction."""
    return f"""
        WITH base AS (
            SELECT {id_col}, ({target_pred}) AS is_target,
                   regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+') AS t
            FROM {table}
        ),
        grams AS (
            SELECT {id_col}, is_target, unnest(t) AS g FROM base
            UNION ALL
            SELECT {id_col}, is_target,
                   array_to_string(list_slice(t, i, i + 1), ' ') AS g
            FROM base,
                 LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
            WHERE len(t) >= 2
        ),
        feats AS (
            SELECT {id_col}, is_target,
                   ('0x' || substr(md5(g || '{salt}'), 1, 8))::BIGINT
                     % {n_buckets} AS bucket
            FROM grams
        ),
        per_bucket AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr,
                   CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
            FROM feats GROUP BY bucket
        ),
        tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM per_bucket),
        ratio AS (
            SELECT bucket,
                   CAST(FLOOR((log2(ct + 1.0) - log2(tt + {n_buckets}.0)
                               - log2(cr + 1.0) + log2(tr + {n_buckets}.0))
                              * 1e6 + 0.5) AS BIGINT) AS lr_micro
            FROM per_bucket, tot
        ),
        doc_w AS (
            SELECT {id_col},
                   CAST(SUM(tf) AS BIGINT) AS n_feats,
                   CAST(SUM(tf * lr_micro) AS BIGINT) AS dsir_micro
            FROM (SELECT {id_col}, bucket, COUNT(*) AS tf
                  FROM feats GROUP BY {id_col}, bucket) tfs
            JOIN ratio USING (bucket)
            GROUP BY {id_col}
        )
        SELECT {id_col}, n_feats, dsir_micro,
               ROW_NUMBER() OVER (ORDER BY dsir_micro DESC, {id_col}) - 1
                 < CAST(FLOOR({keep_frac} * (SELECT COUNT(*) FROM {table}))
                        AS BIGINT) AS selected
        FROM doc_w
    """


# ---------------------------------------------------------------------------
# token-distribution entropy
# ---------------------------------------------------------------------------

def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc token-distribution Shannon entropy (repetition signal):
    (id, n_tokens, n_distinct, entropy_micro) with

        entropy_micro = floor(log2(T)*1e6 + 0.5)
                        - (Σ_tok floor(n_tok*log2(n_tok)*1e6 + 0.5)) div T

    — the fixed-point form of H = log2 T − (1/T)·Σ n·log2 n, identical
    formula on both engines so values match bit-for-bit (≈ H to µ
    precision).

    Scale shape: the ENTIRE operator is higher-order array functions
    (array_distinct / filter / transform / aggregate) inside one narrow
    projection — zero exchanges, zero explode-driven row blowup
    (asserted in tests/test_selection.py).  The inner count loop is
    O(distinct × T) per row, fine for document-sized texts."""
    t = tokens(text_col)
    dt = F.array_distinct(t)
    counts = F.transform(dt, lambda x: F.size(F.filter(t, lambda y: y == x)))
    term_sum = F.aggregate(
        counts,
        F.lit(0).cast("long"),
        lambda acc, n: acc
        + F.floor(n.cast("double") * F.log2(n.cast("double")) * F.lit(1e6) + F.lit(0.5)).cast("long"),
    )
    big_t = F.size(t).cast("long")
    staged = df.select(
        F.col(id_col),
        big_t.alias("_te_t"),
        F.size(dt).cast("long").alias("n_distinct"),
        term_sum.alias("_te_sum"),
    )
    ent = (
        F.floor(
            F.log2(F.col("_te_t").cast("double")) * F.lit(1e6) + F.lit(0.5)
        ).cast("long")
        - F.expr("_te_sum div _te_t")
    )
    return staged.select(
        id_col,
        F.col("_te_t").alias("n_tokens"),
        "n_distinct",
        ent.alias("entropy_micro"),
    )


def duckdb_token_entropy_sql(table: str, id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """Exact mirror via exploded group-by (the oracle need not be
    narrow-map-shaped): same per-distinct-token micro floor, same integer
    div.  Integer sums are order-independent, so the plan difference
    cannot change values."""
    return f"""
        WITH tok AS (
            SELECT {id_col},
                   unnest(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS tk
            FROM {table}
        ),
        cnt AS (
            SELECT {id_col}, tk, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY {id_col}, tk
        )
        SELECT {id_col},
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(FLOOR(log2(SUM(n)) * 1e6 + 0.5) AS BIGINT)
                 - CAST(SUM(CAST(FLOOR(n * log2(n) * 1e6 + 0.5) AS BIGINT))
                        // SUM(n) AS BIGINT) AS entropy_micro
        FROM cnt GROUP BY {id_col}
    """
