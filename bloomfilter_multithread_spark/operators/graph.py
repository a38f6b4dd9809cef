"""Iterative graph algorithms over edge DataFrames — PageRank.

The reference engine has no graph surface; this generalizes its
aggregate-over-stream shape to ITERATIVE dataflow (the one pattern the
other operators don't exercise: a driver loop whose every step is a
distributed join + aggregate). The concrete consumer is agent-behavior
analytics on the transcript shape: rank tools by stationary visit
probability of the tool-transition chain (which tool does an agent
"live in"), the graph being the same lag-window bigrams the
``tool_transitions`` heavy-hitter query counts.

Scale shape (the 100 TB plan):
  - the EDGE table is the big thing (one window pass + one groupBy over
    all turns builds it); it is joined once per iteration.
  - the RANK table is O(|nodes|). Two regimes, selected by
    ``broadcast_ranks``:
      * tool-graphs (nodes ≪ edges, the transcript consumer): ranks are
        BROADCAST to the edge join, so no iteration shuffles anything
        edge-sized;
      * web-scale node sets (ranks don't fit one executor):
        ``broadcast_ranks=False`` pins the edge table ONCE into a
        hash-partitioning on ``src`` (persisted with that partitioning,
        satisfying the join's distribution requirement every
        iteration) and shuffle-joins the rank table to it — the
        per-iteration exchange is O(|nodes|) rank rows; the edge table
        is never reshuffled after the one-time pin. Both modes are
        bit-identical (integer arithmetic; test-pinned).
  - per-iteration contribution sums are map-side combinable longs.
  - the loop is fully LAZY: the dangling-mass scalar rides along as a
    1-row broadcast cross join, so the only driver traffic for the
    whole run is the hoisted node count — the N iterations execute as
    one Spark job.

Numerics: everything is 64-bit integer fixed-point (``scale`` units =
rank 1.0). Per-edge contributions use integer division, so sums are
order-free and the result is BIT-EXACT across engines and partition
counts — a floating-point PageRank would diverge between Spark's and
DuckDB's summation orders. Integer floor loses at most 1 unit per
division, i.e. total mass drifts by < (|edges| + 2·|nodes|) units per
iteration out of 10^12 — quantified, and irrelevant at rank precision.
All quantities stay < 2^63: scale=10^12, so r·w needs w < 9·10^6·|N|
which per-pair transition counts satisfy by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    n_iters: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = PR_SCALE,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Power-iteration PageRank on weighted edges (src, dst, w) in exact
    integer fixed-point.

    Per iteration, with d = num/den and N nodes:
      r'(v) = ((den-num)·scale) div (den·N)          -- teleport
            + (num·dangling_mass) div (den·N)        -- dangling share
            + (num · Σ_{u→v} (r(u)·w) div outw(u)) div den

    Returns (node string, rank_fp long) with Σ rank_fp ≈ scale (floor
    losses only, see module docstring). Deterministic: every operation
    is integer arithmetic over exact aggregates.
    """
    num, den = damping
    # persist the (possibly expensive) edge derivation ONCE — nodes,
    # out-weights, and the per-iteration join all hang off it, and
    # without this the upstream lineage (e.g. a window over all turns)
    # re-executes three times before the first iteration starts
    e = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
        F.col("w").cast("long").alias("w"),
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp"))
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # static across iterations: carry each edge's out-weight once. In
    # join mode, ALSO pin the edge table into hash-partitioning on src
    # with exactly spark.sql.shuffle.partitions partitions, so every
    # iteration's rank join finds its distribution requirement already
    # satisfied on the edge side — the one-time shuffle here is the
    # last time edge bytes move
    if broadcast_ranks:
        e_n = e.join(outw, "src")
    else:
        # out-weights are O(|nodes|) too — at web scale they can't be
        # broadcast any more than the ranks can; this one-time shuffle
        # join is absorbed into the src pin below
        n_shuffle = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        e_n = e.join(outw.hint("shuffle_hash"), "src").repartition(n_shuffle, "src")
    e_n = e_n.persist()
    out_nodes = outw.select(F.col("src").alias("node"))

    teleport = ((den - num) * scale) // (den * n)
    ranks = nodes.select("node", F.lit(int(scale // n)).cast("long").alias("r"))
    for _ in range(n_iters):
        # persisted so the two consumers below (dangling agg + edge
        # join) share one evaluation inside the single final job — the
        # whole loop is LAZY; no per-iteration driver round-trip
        ranks = ranks.persist()
        # dangling mass: rank parked on nodes with no out-edges — a
        # 1-row aggregate carried as a broadcast cross join (8 bytes),
        # keeping the iteration fully plan-side
        dang_df = (
            ranks.join(out_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        rank_src = ranks.withColumnRenamed("node", "src")
        if broadcast_ranks:
            rank_side = F.broadcast(rank_src)
        else:
            # shuffle_hash hint: never broadcast a web-scale rank table,
            # and skip the sort a merge join would add — ranks hash to
            # the edge table's pinned partitioning
            rank_side = rank_src.hint("shuffle_hash")
        insum = (
            e_n.join(rank_side, "src")
            .select(F.col("dst").alias("node"), F.expr("(r * w) div ow").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(insum, "node", "left")
            .crossJoin(F.broadcast(dang_df))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({num} * dang) div ({den} * {n})")
                    + F.expr(f"({num} * coalesce(s, CAST(0 AS BIGINT))) div {den}")
                )
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.withColumnRenamed("r", "rank_fp")


def duckdb_pagerank_sql(
    edges_cte: str,
    n_iters: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = PR_SCALE,
) -> str:
    """DuckDB mirror of :func:`pagerank_fixed_point` — the iterations
    unrolled as CTEs over an ``edges(src, dst, w)`` CTE body supplied by
    the caller. Identical integer arithmetic (`//` ≡ Spark `div` on
    BIGINT; all values non-negative so floor == trunc), hence hash-exact
    against the Spark result."""
    num, den = damping
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        "outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src)",
        f"it0 AS (SELECT node, CAST((SELECT {scale} // n FROM nn) AS BIGINT) AS r FROM nodes)",
    ]
    for t in range(1, n_iters + 1):
        prev = f"it{t - 1}"
        parts.append(
            f"""it{t} AS (
              SELECT nd.node,
                     CAST(
                       ((({den} - {num}) * {scale}) // ({den} * (SELECT n FROM nn)))
                     + (({num} * (SELECT COALESCE(SUM(r.r), 0) FROM {prev} r
                                  LEFT JOIN outw o ON r.node = o.src
                                  WHERE o.src IS NULL)) // ({den} * (SELECT n FROM nn)))
                     + (({num} * COALESCE(s.s, 0)) // {den})
                     AS BIGINT) AS r
              FROM nodes nd LEFT JOIN (
                  SELECT e.dst AS node, SUM((r.r * e.w) // o.ow) AS s
                  FROM edges e
                  JOIN {prev} r ON e.src = r.node
                  JOIN outw o ON e.src = o.src
                  GROUP BY e.dst) s ON nd.node = s.node
            )"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, CAST(r AS BIGINT) AS rank_fp FROM it{n_iters}"
    )
