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
