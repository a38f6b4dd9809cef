"""Connected components over a pair table — the cluster-assignment step a
dedup pipeline needs AFTER pair finding (MinHash/SimHash/embedding LSH all
emit near-dup PAIRS; keeping one representative per duplicate *group*
requires the transitive closure of those pairs).

The reference engine stops at membership answers (Bloom probe,
``src/SkmerSplitter.cpp:130-137``); grouping its hits into components is
exactly the kind of multi-pass dataflow the survey flags as the engine's
gap (SURVEY.md §2 A2 note) and a core LLM-training-data operation
("drop all but one document per near-dup cluster").

Algorithm: iterative hash-min label propagation — every node repeatedly
adopts the minimum label in its closed neighborhood until fixpoint.
Converges in O(diameter) rounds; the two-phase large-star/small-star
scheme of Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) brings worst-case rounds to O(log^2 n), but near-dup graphs at
100 TB are overwhelmingly tiny, shallow clusters (pairs all sharing one
duplicated text), where plain hash-min already terminates in 2-4 rounds
and each round is two shuffles over 16-byte (id, label) rows — no text,
no vectors. Scale notes:

- Edges are symmetrized once up front; every iteration shuffles only
  (long, long) rows — independent of document size.
- Lineage is truncated every round with ``localCheckpoint`` (an iterative
  plan otherwise doubles in depth per round and eventually overwhelms the
  optimizer). A production cluster job would use ``checkpoint()`` against
  a reliable dir instead — localCheckpoint trades fault tolerance for
  speed, which is the right trade under a driver that re-runs the query.
- Convergence is detected by the strictly-decreasing sum of labels
  (labels only ever decrease, so an unchanged DECIMAL(38,0) sum — no
  overflow at any scale — proves the fixpoint) — one cheap aggregate per
  round instead of a change-counting self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id of its connected component.

    Parameters
    ----------
    edges : DataFrame with two long-castable columns ``src`` and ``dst``.
        Direction and duplicates are irrelevant (symmetrized + min-agg
        internally). Self-loops are harmless.
    max_iter : hard stop; raises if the fixpoint is not reached (a
        pathological chain longer than ``max_iter`` — raise it for such
        graphs or switch to a star-contraction scheme).

    Returns
    -------
    DataFrame (id: long, component: long) — one row per distinct node
    appearing in ``edges``. Isolated nodes (no edges) are by definition
    absent; union them in as ``component = id`` if needed.
    """
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # closed neighborhood: adjacency plus the self-edge, so a node's own
    # label competes in the min below
    adj = sym.unionByName(
        sym.select("a", F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)

    labels = adj.select("a").distinct().select(
        F.col("a").alias("id"), F.col("a").alias("component")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_iter):
        # new label of a = min over neighbors b (incl. self) of label(b)
        labels = (
            adj.join(labels, adj["b"] == labels["id"], "inner")
            .select(F.col("a").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def duckdb_components_sql(pairs_sql: str, id_type: str = "BIGINT") -> str:
    """Recursive-CTE transitive closure over the pair query ``pairs_sql``
    (must yield columns id_a, id_b) — labels every node with MIN(id) of
    its component, plus the component size. Mirrors
    ``connected_components`` exactly (both compute min-id labels of the
    same undirected closure); quadratic-ish in component size, fine for
    an oracle."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b AS a, id_a AS b FROM pairs
        ),
        reach(id, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
        ),
        labels AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        sizes AS (
            SELECT component, COUNT(*) AS cluster_size FROM labels GROUP BY component
        )
        SELECT CAST(id AS {id_type}) AS doc_id,
               CAST(component AS {id_type}) AS cluster_id,
               CAST(cluster_size AS BIGINT) AS cluster_size
        FROM labels JOIN sizes USING (component)
    """
