"""Decontamination (operators/decontam.py) and within-doc repetition
(textstats.repetition_stats) — crafted-corpus exactness + the Bloom
prefilter's zero-false-negative guarantee."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def corpus_df(spark):
    docs = [
        # eval doc: its 5-grams are the contamination source
        (0, "the quick brown fox jumps over the lazy dog"),
        # train doc embedding one full eval 5-gram ("quick brown fox jumps over")
        (1, "we saw the quick brown fox jumps over again yesterday"),
        # train doc with no eval overlap
        (2, "completely different words appear in this training document here"),
        # train doc shorter than k -> whole-text shingle, no overlap
        (3, "tiny"),
        # train doc repeating an eval gram twice (distinct-gram counting)
        (4, "quick brown fox jumps over and quick brown fox jumps over"),
    ]
    return spark.createDataFrame(docs, "doc_id int, text string")


def test_decontaminate_exact(spark, corpus_df):
    from bloomfilter_multithread_spark.operators.decontam import decontaminate

    eval_df = corpus_df.where("doc_id = 0")
    train = corpus_df.where("doc_id != 0")
    got = {r["doc_id"]: (r["n_grams"], r["n_eval_hits"], r["contaminated"])
           for r in decontaminate(train, eval_df, k=5).collect()}
    assert set(got) == {1, 2, 3, 4}
    # doc 1: tokens=10 -> 6 grams, distinct 6; grams 3..? exactly the
    # eval grams "the quick brown fox jumps" and "quick brown fox jumps over"
    assert got[1] == (6, 2, True)
    assert got[2][1] == 0 and got[2][2] is False
    assert got[3] == (1, 0, False)
    # doc 4: 12 tokens -> 8 grams, but the repeat collapses distinct;
    # hits counted over DISTINCT grams
    n_grams, n_hits, flag = got[4]
    assert flag is True and 1 <= n_hits <= n_grams


def test_decontaminate_zero_false_negatives(spark, corpus_df):
    """Every truly-overlapping doc is flagged even with a tiny Bloom
    (more FPs -> more confirm work, never a miss)."""
    from bloomfilter_multithread_spark.operators.decontam import decontaminate

    eval_df = corpus_df.where("doc_id = 0")
    train = corpus_df.where("doc_id != 0")
    got = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(train, eval_df, k=5,
                                  m_bits=1 << 8, k_hashes=2).collect()}
    assert got[1] is True and got[4] is True


def test_repetition_stats_exact(spark):
    from bloomfilter_multithread_spark.operators.textstats import repetition_stats

    docs = [
        (1, "a b c a b c a b c"),   # 9 tokens -> 7 3-grams; distinct: abc bca cab = 3
        (2, "u v w x y z"),          # 4 grams, all distinct
        (3, "hi"),                   # < k -> 1 whole-text gram
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct_grams"], r["rep_bp"])
           for r in repetition_stats(df, k=3).collect()}
    assert got[1] == (7, 3, 5714)   # floor(10000*4/7)
    assert got[2] == (4, 4, 0)
    assert got[3] == (1, 1, 0)


# ------------------------------------------------------- unigram LM NLL
class TestUnigramNLL:
    def test_single_doc_hand_computed(self, spark):
        import math

        from bloomfilter_multithread_spark.operators.textstats import (
            unigram_nll_scores,
        )

        # corpus: "a a b" / "a c" -> c(a)=3, c(b)=1, c(c)=1, T=5, V=3
        df = spark.createDataFrame(
            [(0, "a a b"), (1, "a c")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in unigram_nll_scores(df).collect()}
        n = lambda c: math.floor((math.log2(8.0) - math.log2(c + 1.0)) * 1e6 + 0.5)  # noqa: E731
        assert rows[0]["n_tokens"] == 3 and rows[1]["n_tokens"] == 2
        assert rows[0]["nll_micro"] == 2 * n(3) + n(1)
        assert rows[1]["nll_micro"] == n(3) + n(1)
        assert rows[0]["avg_nll_micro"] == rows[0]["nll_micro"] // 3

    def test_rare_tokens_score_higher(self, spark):
        from bloomfilter_multithread_spark.operators.textstats import (
            unigram_nll_scores,
        )

        common = " ".join(["the"] * 20)
        df = spark.createDataFrame(
            [(0, common), (1, common), (2, common), (3, "zyx qwv jkl")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["avg_nll_micro"] for r in unigram_nll_scores(df).collect()}
        assert rows[3] > rows[0]  # the garbled doc is less probable

    def test_micro_rounding_margins_guard_the_floor(self):
        """bm25-pattern freeze: every per-(doc,tok) scaled NLL must sit
        >= 1e-6 micro units from a floor boundary, so a 1-ulp log2()
        divergence between the JVM and libm can never flip the rounded
        contribution (drift <= x*1e-16 ~ 3e-10 micro on this data)."""
        import duckdb

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.01/documents.parquet'"
        )
        q = """
            WITH toks AS (
                SELECT doc_id AS _id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents),
            tf AS (SELECT _id, tok, COUNT(*) AS tf FROM toks GROUP BY _id, tok),
            counts AS (SELECT tok, SUM(tf) AS c FROM tf GROUP BY tok),
            stats AS (SELECT SUM(c) AS t_total, COUNT(*) AS v_size FROM counts),
            x AS (
                SELECT (log2(s.t_total + s.v_size) - log2(counts.c + 1.0))
                       * 1e6 + 0.5 AS x
                FROM tf JOIN counts USING (tok) CROSS JOIN stats s)
            SELECT MIN(LEAST(x - FLOOR(x), CEIL(x) - x)) AS margin, COUNT(*) AS n
            FROM x
        """
        margin, n = con.sql(q).fetchone()
        assert n > 1000
        assert margin >= 1e-6, f"NLL contribution within {margin} of a boundary"
