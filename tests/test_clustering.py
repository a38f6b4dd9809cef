"""Connected components: known graphs, a union-find property check, and
convergence behavior on a long chain."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.clustering import connected_components


def _uf_components(edges):
    """Reference union-find labelling: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    return {r["id"]: r["component"] for r in connected_components(df).collect()}


def test_two_components(spark):
    got = _cc_dict(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_duplicate_and_reversed_edges_and_self_loops(spark):
    got = _cc_dict(spark, [(2, 1), (1, 2), (3, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges(spark):
    n = 24
    got = _cc_dict(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_matches_union_find_on_random_graph(spark):
    rng = np.random.default_rng(7)
    edges = [tuple(x) for x in rng.integers(0, 200, size=(300, 2))]
    want = _uf_components(edges)
    got = _cc_dict(spark, edges)
    assert got == want


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(10)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
