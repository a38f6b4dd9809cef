"""Document chunking and sequence packing — the shaping ops that turn a
deduped corpus into fixed-budget training/retrieval units.

The reference's segmentation operator cuts a sequence wherever its
minimizer changes (``src/SkmerExtractor.cpp:126-176`` — content-defined
boundaries); these are its fixed-width cousins for LLM data prep:

- ``chunk_sliding``: overlapping token windows per document (RAG /
  long-context chunking). Pure JVM explode of a ``sequence()`` of chunk
  starts + array slicing of the whitespace tokenization — no Python, no
  shuffle at all (narrow transformation; chunks inherit the input's
  partitioning).
- ``pack_greedy``: concatenate each stream's documents in a
  deterministic order and cut every ``budget`` tokens (split-allowed
  greedy packing — the standard "pack then slice" recipe). One window
  cumsum per stream: seq ids derive from the exclusive running token
  count, so a document knows the first/last training sequence it lands
  in and its offset in the first, without materializing token rows.
  Packing is per-stream (PARTITION BY a shard/source column) — a global
  order would mean a global sort; per-stream keeps it one hash shuffle
  at any scale, which is how production packers shard anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+")


def chunk_sliding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping chunks: starts at 0, stride, 2*stride, ... while
    start < n_tokens; each chunk covers tokens [start, start+max_tokens)
    clipped to the document. ``stride < max_tokens`` gives
    ``max_tokens - stride`` tokens of overlap. Returns one row per chunk
    with its reassembled text."""
    if stride < 1 or max_tokens < 1:
        raise ValueError("max_tokens and stride must be >= 1")
    toks = df.select(
        F.col(id_col), _tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    chunks = toks.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride))
        ).alias("chunk_idx", "start_tok"),
    )
    n_chunk = F.least(F.lit(max_tokens), F.col("_n") - F.col("start_tok"))
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        n_chunk.cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("start_tok") + 1, n_chunk), " "
        ).alias("chunk_text"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "source",
    budget: int = 512,
) -> DataFrame:
    """Split-allowed greedy packing: within each ``stream_col`` partition,
    documents are laid head-to-tail in ``id_col`` order and the token
    stream is cut every ``budget`` tokens. Emits, per document, the
    packed-sequence span it occupies:

        first_seq  = floor(tokens_before / budget)
        last_seq   = floor((tokens_before + n_tokens - 1) / budget)
        offset_in_first = tokens_before % budget

    (documents spanning a cut belong to multiple sequences — the
    split-allowed model; a document never straddles streams)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = df.select(
        F.col(id_col), F.col(stream_col), F.size(_tokens(text_col)).alias("n_tokens")
    )
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        id_col,
        stream_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(before / budget).cast("long").alias("first_seq"),
        F.floor((before + F.col("n_tokens") - 1) / budget).cast("long").alias("last_seq"),
        (before % budget).cast("long").alias("offset_in_first"),
    )


def duckdb_chunk_sliding_sql(table: str, id_col: str = "doc_id",
                             text_col: str = "text", max_tokens: int = 64,
                             stride: int = 48) -> str:
    """Exact mirror of ``chunk_sliding`` (1-based inclusive list slicing
    on both engines verified equivalent)."""
    return f"""
        WITH t AS (
            SELECT {id_col},
                   regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                   len(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS n
            FROM {table}
        ),
        c AS (
            SELECT {id_col}, toks, n,
                   g.start_tok,
                   CAST((g.start_tok // {stride}) AS BIGINT) AS chunk_idx
            FROM t, LATERAL (
                SELECT unnest(generate_series(0, greatest(n - 1, 0), {stride}))
                       AS start_tok) g
        )
        SELECT {id_col},
               chunk_idx,
               CAST(start_tok AS BIGINT) AS start_tok,
               CAST(LEAST({max_tokens}, n - start_tok) AS BIGINT) AS n_tokens,
               array_to_string(
                   toks[(start_tok + 1):(start_tok + LEAST({max_tokens}, n - start_tok))],
                   ' ') AS chunk_text
        FROM c
    """


def duckdb_pack_greedy_sql(table: str, id_col: str = "doc_id",
                           text_col: str = "text", stream_col: str = "source",
                           budget: int = 512) -> str:
    """Exact mirror of ``pack_greedy``."""
    return f"""
        WITH t AS (
            SELECT {id_col}, {stream_col},
                   len(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS n_tokens
            FROM {table}
        ),
        c AS (
            SELECT *,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY {stream_col} ORDER BY {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS before
            FROM t
        )
        SELECT {id_col}, {stream_col},
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(FLOOR(before / {budget}) AS BIGINT) AS first_seq,
               CAST(FLOOR((before + n_tokens - 1) / {budget}) AS BIGINT) AS last_seq,
               CAST(before % {budget} AS BIGINT) AS offset_in_first
        FROM c
    """
