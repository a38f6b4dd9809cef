"""BM25: hand-computed single-doc case, rounding-boundary margins (the
ln-ulp guarantee), and scale-shape sanity."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.textstats import bm25_scores, duckdb_bm25_sql

TERMS = ["spark", "vector", "dup", "stream"]


def test_hand_computed_single_doc(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    row = bm25_scores(df, ["a"]).collect()[0]
    # N=1, df=1 -> idf = ln(1 + 0.5/1.5); tf=2, dl=3 = avgdl
    # denom = 2 + 1.2*(0.25 + 0.75*1) = 3.2
    want = math.log(1 + 0.5 / 1.5) * (2 * 2.2) / 3.2
    assert row["n_matched_terms"] == 1
    assert abs(row["score_micro"] - math.floor(want * 1e6 + 0.5)) <= 1


def test_docs_without_query_terms_are_absent(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c c")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in bm25_scores(df, ["a"]).collect()}
    assert got == {1}


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_contributions_far_from_rounding_boundaries(sf):
    """Every per-(doc,term) contribution must sit >= 1e-6 micro units away
    from a floor boundary. A 1-ulp ln() divergence between Java and libm
    moves the scaled contribution by at most ~x * 1e-16 <= ~3e-10 micro
    on this data, so a 1e-6 margin (>1000x that) means the floor can
    never flip — the freeze that makes the micro-rounded score
    oracle-exact (same pattern as the ANN argmax margin tests).
    Measured margins: 4.9e-4 (sf0.001), checked per-run below."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf{sf}/documents.parquet'")
    # the unrounded contributions of duckdb_bm25_sql, with the distance
    # of each from its nearest floor boundary
    q = f"""
        WITH toks AS (
            SELECT doc_id AS _id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents),
        dl AS (SELECT _id, COUNT(*) AS dl FROM toks GROUP BY _id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl)/COUNT(*) AS avgdl FROM dl),
        tf AS (SELECT _id, tok, COUNT(*) AS tf FROM toks
               WHERE tok IN ({', '.join("'" + t + "'" for t in TERMS)})
               GROUP BY _id, tok),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        c AS (
            SELECT ln(1.0 + (s.n_docs - dfreq.df + 0.5)/(dfreq.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                   * 1e6 + 0.5 AS x
            FROM tf JOIN dfreq USING (tok) JOIN dl ON dl._id = tf._id
            CROSS JOIN stats s)
        SELECT MIN(LEAST(x - FLOOR(x), CEIL(x) - x)) AS margin, COUNT(*) AS n FROM c
    """
    margin, n = con.sql(q).fetchone()
    assert n > 100  # fixture sanity: plenty of contributions checked
    assert margin >= 1e-6, f"contribution within {margin} of a floor boundary"
