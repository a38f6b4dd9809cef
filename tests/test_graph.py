"""PageRank (integer fixed-point power iteration) — operators/graph.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from bloomfilter_multithread_spark.operators.graph import (
    PR_SCALE,
    duckdb_pagerank_sql,
    pagerank_fixed_point,
)

EDGES = [
    # (src, dst, w) — a small asymmetric graph with a dangling node "e"
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 4),
    ("c", "d", 1),
    ("d", "a", 1),
    ("d", "e", 5),  # e has no out-edges -> dangling
]


def _numpy_pagerank(edges, n_iters=3, d=0.85):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, _, w in edges:
        outw[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dang = r[outw == 0].sum()
        nxt = np.full(n, (1 - d) / n + d * dang / n)
        for s, t, w in edges:
            nxt[idx[t]] += d * r[idx[s]] * w / outw[idx[s]]
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def _edges_df(spark, edges=EDGES, parts=1):
    return spark.createDataFrame(edges, "src string, dst string, w long").repartition(
        parts
    )


def test_matches_float_reference_within_fixed_point_loss(spark):
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(_edges_df(spark), n_iters=3).collect()
    }
    want = _numpy_pagerank(EDGES, n_iters=3)
    assert set(got) == set(want)
    for node, fp in got.items():
        # floor losses are < (|E| + 2|N|) units per iteration out of 1e12
        assert abs(fp / PR_SCALE - want[node]) < 1e-9, node


def test_mass_conserved_up_to_floor_loss(spark):
    ranks = pagerank_fixed_point(_edges_df(spark), n_iters=3).collect()
    total = sum(r["rank_fp"] for r in ranks)
    n_terms = (len(EDGES) + 2 * len(ranks) + 2) * 3
    assert 0 <= PR_SCALE - total <= n_terms


def test_uniform_cycle_gives_equal_ranks_exactly(spark):
    cyc = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    ranks = pagerank_fixed_point(_edges_df(spark, cyc), n_iters=4).collect()
    vals = {r["rank_fp"] for r in ranks}
    assert len(vals) == 1  # symmetry is exact in integer arithmetic


def test_partition_count_invariance_bit_exact(spark):
    a = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(_edges_df(spark, parts=1)).collect()
    )
    b = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(_edges_df(spark, parts=7)).collect()
    )
    assert a == b


def test_duckdb_mirror_is_hash_exact(spark):
    got = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(_edges_df(spark), n_iters=3).collect()
    )
    values = ", ".join(f"('{s}', '{t}', CAST({w} AS BIGINT))" for s, t, w in EDGES)
    sql = duckdb_pagerank_sql(
        f"SELECT * FROM (VALUES {values}) AS v(src, dst, w)", n_iters=3
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src string, dst string, w long")
    assert pagerank_fixed_point(empty).count() == 0


def test_rank_table_is_broadcast_joined(spark):
    # the per-iteration edge join must broadcast the rank side — an
    # iteration that reshuffles the edge table would not survive scale
    plan = pagerank_fixed_point(_edges_df(spark), n_iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_join_mode_bit_identical_to_broadcast_mode(spark):
    """broadcast_ranks=False (web-scale node sets: ranks shuffle-join to
    the src-pinned edge table instead of broadcasting) must be
    BIT-identical — all arithmetic is integer, only the physical join
    strategy changes."""
    got_b = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(_edges_df(spark), n_iters=3).collect()
    )
    got_j = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(
            _edges_df(spark), n_iters=3, broadcast_ranks=False
        ).collect()
    )
    assert got_b == got_j


def test_join_mode_rank_join_is_not_broadcast(spark):
    """In join mode the per-iteration rank↔edge join must be a shuffled
    hash join (a web-scale rank table cannot be broadcast), and the
    persisted edge table is pinned to hashpartitioning(src) so its side
    of the join needs no per-iteration exchange."""
    plan = (
        pagerank_fixed_point(_edges_df(spark), n_iters=1, broadcast_ranks=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ShuffledHashJoin" in plan
    # the only BroadcastHashJoins allowed are the scalar dangling-mass
    # cross join machinery, never a join keyed on src
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "src" not in line, line


@pytest.mark.parametrize("n_iters", [1, 2])
def test_iteration_count_respected_vs_numpy(spark, n_iters):
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(_edges_df(spark), n_iters=n_iters).collect()
    }
    want = _numpy_pagerank(EDGES, n_iters=n_iters)
    for node in want:
        assert abs(got[node] / PR_SCALE - want[node]) < 1e-9
