"""Chunking/packing: hand-built python reference parity, overlap
reconstruction invariants, budget-boundary cases, and plan shape (chunking
must be shuffle-free)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.chunking import chunk_sliding, pack_greedy


def _py_chunks(text, max_tokens, stride):
    toks = text.strip().split()
    out = []
    s = 0
    idx = 0
    while s < len(toks):
        out.append((idx, s, min(max_tokens, len(toks) - s),
                    " ".join(toks[s : s + max_tokens])))
        idx += 1
        s += stride
    return out


def test_chunks_match_python_reference(spark):
    rng = np.random.default_rng(8)
    docs = [
        (i, " ".join(f"w{int(x)}" for x in rng.integers(0, 50, int(n))))
        for i, n in enumerate(rng.integers(1, 150, 40))
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in chunk_sliding(df, max_tokens=16, stride=12).collect()
    }
    want = {}
    for i, text in docs:
        for idx, s, n, ctext in _py_chunks(text, 16, 12):
            want[(i, idx)] = (s, n, ctext)
    assert got == want


def test_overlap_reconstruction(spark):
    """Dropping each chunk's trailing overlap and concatenating must
    reproduce the document exactly."""
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_sliding(df, max_tokens=20, stride=15).collect(),
                  key=lambda r: r["chunk_idx"])
    rebuilt = []
    for r in rows:
        rebuilt.extend(r["chunk_text"].split()[:15])
    assert " ".join(rebuilt[:100]) == text


def test_chunking_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_sliding(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_greedy_spans(spark):
    # stream x: docs of 5, 3, 4 tokens, budget 6:
    #   doc 0: before=0 -> seq 0..0, offset 0
    #   doc 1: before=5 -> covers tokens 5..7 -> seq 0..1, offset 5
    #   doc 2: before=8 -> tokens 8..11 -> seq 1..1, offset 2
    rows = [(0, "x", "a a a a a"), (1, "x", "b b b"), (2, "x", "c c c c"),
            (3, "y", "d d d d d d d")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: (r["first_seq"], r["last_seq"], r["offset_in_first"])
           for r in pack_greedy(df, budget=6).collect()}
    assert got == {0: (0, 0, 0), 1: (0, 1, 5), 2: (1, 1, 2), 3: (0, 1, 0)}


def test_pack_budget_exact_boundary(spark):
    # a doc ending exactly at the cut: next doc starts a fresh sequence
    rows = [(0, "x", "a a a a"), (1, "x", "b b")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: (r["first_seq"], r["last_seq"], r["offset_in_first"])
           for r in pack_greedy(df, budget=4).collect()}
    assert got == {0: (0, 0, 0), 1: (1, 1, 0)}


def test_pack_conservation(spark):
    """Total packed mass: the max seq id per stream must equal
    floor((total_tokens - 1)/budget)."""
    rng = np.random.default_rng(3)
    rows = [
        (i, f"s{int(i) % 3}", " ".join("w" for _ in range(int(n))))
        for i, n in enumerate(rng.integers(1, 40, 60))
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_greedy(df, budget=32).collect()
    by_stream: dict[str, list] = {}
    for r in out:
        by_stream.setdefault(r["source"], []).append(r)
    for s, rs in by_stream.items():
        total = sum(r["n_tokens"] for r in rs)
        assert max(r["last_seq"] for r in rs) == (total - 1) // 32
