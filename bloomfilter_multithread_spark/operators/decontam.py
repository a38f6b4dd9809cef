"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation set.

The standard pretraining hygiene step (GPT-3 appx. C / PaLM style):
any training document containing an n-gram that also occurs in a held-out
benchmark is "contaminated" and gets dropped or audited.  This is the
reference's own corpus/probe membership pipeline
(/root/reference/src/SkmerSplitter.cpp:91-151 — build a Bloom over corpus
k-mers, probe queries) pointed at the train/eval split instead of
corpus/reads, which is why it composes entirely from this package's
existing parts:

  1. build a Bloom filter over the EVAL set's distinct shingle hashes
     (eval sets are tiny relative to the corpus — the sketch is a few MB
     broadcast once);
  2. map-side Bloom probe of every train shingle — zero false negatives
     means survivors are a SUPERSET of true hits, so step 3 is exact;
  3. exact confirm: join the surviving (train doc, md5(shingle)) rows
     against the eval set's distinct md5 grams, then aggregate per doc.

At 100 TB the probe eliminates ~all clean grams map-side (FPR-bounded),
so the confirm join's left side is roughly the true contamination volume,
not the corpus; the eval side is broadcast.  Exchanges carry
(id, 32-hex md5) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shingles import explode_shingles
from .build import SketchSpec, build_sketches, with_might_contain


def decontaminate(train: DataFrame, eval_df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 5,
                  m_bits: int = 1 << 22, k_hashes: int = 5) -> DataFrame:
    """Per-train-document eval-overlap stats:
    (id, n_grams, n_eval_hits, contaminated).

    ``n_grams`` counts the doc's DISTINCT grams; ``n_eval_hits`` is how
    many of those occur anywhere in ``eval_df``.  Exact (the Bloom is a
    prefilter only — zero FN + exact confirm)."""
    ev_grams = (
        explode_shingles(eval_df.select(text_col), text_col, k)
        .select(F.md5("shingle").alias("_h"))
        .distinct()
    )
    bloom = build_sketches(
        ev_grams, [SketchSpec("b", "bloom", "_h", {"m_bits": m_bits, "k": k_hashes})]
    )["b"]

    tr = (
        explode_shingles(train.select(id_col, text_col), text_col, k)
        .select(id_col, F.md5("shingle").alias("_h"))
        .distinct()
    )
    cand = with_might_contain(tr, "_h", bloom)
    hits = (
        cand.where("might_contain")
        .join(F.broadcast(ev_grams), "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_eval_hits"))
    )
    per_doc = tr.groupBy(id_col).agg(F.count("*").cast("long").alias("n_grams"))
    return (
        per_doc.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duckdb_decontaminate_sql(table: str, id_col: str, text_col: str,
                             k: int, eval_pred: str, train_pred: str) -> str:
    """Exact mirror: distinct md5 grams per side, IN-join, per-doc agg."""
    from ..functions.shingles import duckdb_shingles_cte

    cte = duckdb_shingles_cte(table, id_col, text_col, k)
    return f"""
        WITH sh AS ({cte}),
        ev AS (SELECT DISTINCT md5(shingle) AS h FROM sh WHERE {eval_pred}),
        tr AS (SELECT DISTINCT {id_col}, md5(shingle) AS h FROM sh
               WHERE {train_pred})
        SELECT {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN h IN (SELECT h FROM ev) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_eval_hits,
               SUM(CASE WHEN h IN (SELECT h FROM ev) THEN 1 ELSE 0 END) > 0
                 AS contaminated
        FROM tr GROUP BY {id_col}
    """
