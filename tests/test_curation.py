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
                       unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
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


# ------------------------------------------------------- Gopher rules


def test_gopher_rules_each_rule_isolated(spark):
    from bloomfilter_multithread_spark.operators.textstats import gopher_rules

    stop60 = " ".join(["the fast key order sort"] * 12)  # 60 words, stopwords, len 3-5
    docs = [
        (0, stop60),                                # passes everything
        (1, "the fast key"),                        # fails word count only
        (2, " ".join(["a"] * 60)),                  # mean word len 1 < 3
        (3, " ".join(["### ..."] * 30) + " " + stop60),  # symbol ratio + alpha
        (4, " ".join(["zzzqx wvvkj"] * 30)),        # no stopword hits
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert got[0]["keep"] is True and all(
        got[0][c] for c in got[0] if c.startswith("ok_")
    )
    assert got[1]["ok_word_count"] is False
    assert got[2]["ok_mean_word_len"] is False
    assert got[3]["ok_symbol_ratio"] is False
    assert got[4]["ok_stopwords"] is False and got[4]["ok_alpha_words"] is True
    assert all(not got[i]["keep"] for i in (1, 2, 3, 4))


def test_gopher_mean_len_integer_boundary(spark):
    """3n <= sum_len <= 10n is EXACT at the boundary: 60 words of mean
    exactly 3.0 pass; one char less fails — no float epsilon anywhere."""
    from bloomfilter_multithread_spark.operators.textstats import gopher_rules

    exactly3 = " ".join(["the"] * 60)               # sum_len = 180 = 3n
    just_under = " ".join(["the"] * 59 + ["th"])    # sum_len = 179 < 3n
    df = spark.createDataFrame(
        [(0, exactly3), (1, just_under)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["ok_mean_word_len"] for r in gopher_rules(df).collect()}
    assert got == {0: True, 1: False}


# ------------------------------------------------------- C4 line dedup


def test_line_dedup_planted_boilerplate(spark):
    from bloomfilter_multithread_spark.operators.dedup import line_dedup_stats

    boiler = "b01 b02 b03 b04 b05 b06 b07 b08 b09 b10"  # one exact 10-token unit
    docs = [
        (0, boiler + " u01 u02 u03 u04 u05 u06 u07 u08 u09 u10"),
        (1, boiler + " v01 v02 v03"),
        (2, boiler),                       # third occurrence -> count 3 = dup
        (3, "w01 w02 w03 w04 w05"),        # < 10 tokens: one short unique line
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dup_lines"], r["n_kept_lines"])
        for r in line_dedup_stats(df, line_tokens=10, min_count=3).collect()
    }
    assert got == {0: (2, 1, 1), 1: (2, 1, 1), 2: (1, 1, 0), 3: (1, 0, 1)}


def test_line_dedup_exchanges_carry_digests_only(spark):
    """No exchange ships line text: every Exchange row is (id, md5) /
    (md5, count) shaped — the text column never leaves the map side."""
    from bloomfilter_multithread_spark.operators.dedup import line_dedup_stats

    df = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    plan = (
        line_dedup_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in ex, ex


# ------------------------------------------------- cross-source overlap


def test_source_overlap_planted(spark):
    from bloomfilter_multithread_spark.operators.dedup import (
        source_overlap_matrix,
    )

    shared = "s01 s02 s03 s04 s05 s06 s07 s08 s09 s10"
    docs = [
        ("A", shared + " a01 a02 a03 a04 a05 a06 a07 a08 a09 a10"),
        ("B", shared),
        ("B", "b01 b02 b03"),
        ("C", "c01 c02 c03"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {(r.source_a, r.source_b): r.shared_units
           for r in source_overlap_matrix(df).collect()}
    # A: {shared, a-unit}; B: {shared, b-unit}; C: {c-unit}
    assert got == {
        ("A", "A"): 2, ("B", "B"): 2, ("C", "C"): 1,
        ("A", "B"): 1,
    }


def test_source_overlap_mirror_parity(spark, sf_dir):
    import duckdb

    from bloomfilter_multithread_spark.operators.dedup import (
        duckdb_source_overlap_sql,
        source_overlap_matrix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {(r.source_a, r.source_b): r.shared_units
           for r in source_overlap_matrix(docs).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {(r[0], r[1]): r[2] for r in
            con.execute(duckdb_source_overlap_sql("documents")).fetchall()}
    assert got == want
    assert any(a != b for a, b in got)  # off-diagonal is populated


def test_source_overlap_exchanges_carry_digests_only(spark):
    """The one data exchange is digest-keyed; unit text and token
    arrays never leave the map side, and there is no self-join (a
    single scan feeds the pair expansion)."""
    import re

    from bloomfilter_multithread_spark.operators.dedup import (
        source_overlap_matrix,
    )

    df = spark.createDataFrame([("A", "a b c")], "source string, text string")
    plan = (
        source_overlap_matrix(df)._jdf.queryExecution().executedPlan().toString()
    )
    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in ex and "_toks" not in ex, ex
    assert "Join" not in plan, plan
    assert plan.count("Scan ExistingRDD") <= 1


# ------------------------------------------------------------ vocab_growth

def test_vocab_growth_exact_counts(spark):
    from bloomfilter_multithread_spark.operators.textstats import vocab_growth

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b a b"), (2, "c d")],
        "doc_id int, text string",
    )
    got = {r.k: (r.n_grams, r.n_distinct, r.distinct_ppm)
           for r in vocab_growth(df, ks=(1, 2)).collect()}
    # k=1: 10 tokens total, distinct {a,b,c,d} = 4
    assert got[1] == (10, 4, 400000)
    # k=2: per doc 0/1: "a b","b a","a b" (3 each); doc 2: "c d" (1)
    # total 7, distinct {"a b","b a","c d"} = 3
    assert got[2] == (7, 3, 428571)


def test_vocab_growth_digests_before_exchange(spark):
    import re

    from bloomfilter_multithread_spark.operators.textstats import vocab_growth

    df = spark.createDataFrame([(0, "a b c d e f")], "doc_id int, text string")
    plan = (
        vocab_growth(df)._jdf.queryExecution().executedPlan().toString()
    )
    # exchanges carry md5 digests, never raw shingle/token arrays
    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "shingle" not in ex, ex
    assert "Expand" not in plan  # single distinct agg -> no expand


def test_vocab_growth_is_partitioning_invariant(spark):
    from bloomfilter_multithread_spark.operators.textstats import vocab_growth

    rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 5} x y") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = sorted(map(tuple, vocab_growth(df).collect()))
    b = sorted(map(tuple, vocab_growth(df.repartition(13)).collect()))
    assert a == b
