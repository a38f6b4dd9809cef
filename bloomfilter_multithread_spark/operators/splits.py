"""Group-aware train/validation/test splitting — the leakage-safe
dataset split a training pipeline needs at corpus scale.

Row-hash splits leak: near-duplicate documents (same domain, same
conversation, same dedup cluster) land on both sides of the train/eval
boundary and inflate eval scores. The group-aware rule assigns every
row of a GROUP (registered domain, conv_id, cluster id) to the same
split — scikit-learn's GroupShuffleSplit, re-expressed as a pure
map-side projection: split membership is a deterministic function of
the group VALUE (md5 bucket in [0, 1e6) ppm space, the engine's shared
sampling idiom), so it needs NO shuffle, no RNG state, no group table,
and is identical on any engine / partitioning / retry. Growing the
corpus never reassigns an existing group (assignment depends only on
the group value and seed), so yesterday's eval set stays eval.

Reference lineage: the reference routes each super-k-mer to one of q
disjoint Bloom filters by minimizer hash (`fifo_nb = hmin % q`,
/root/reference/src/SkmerExtractor.cpp:164,187, xorshift32 at
SkmerSplitter.cpp:4-13) — hash-routing units to disjoint destinations.
group_split is the same disjoint-routing idea lifted from k-mers to
curation groups, with ppm thresholds instead of uniform q-ways.

Scale shape: the split column is a whole-stage-codegen CASE over one
md5 — zero exchanges until whatever aggregation the caller adds
(plan-asserted in tests/test_splits.py). At 100 TB this is the
cheapest possible split: no join against an assignment table, no
global sort, and the group key can itself be a derived column (the
contract query routes on the URL family's registered_domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import BUCKETS, duckdb_hash_bucket_sql, hash_bucket

__all__ = ["group_split", "duckdb_group_split_case", "split_leakage"]

DEFAULT_SPLITS = (("train", 800_000), ("val", 100_000), ("test", 100_000))


def _check(splits: tuple[tuple[str, int], ...], buckets: int) -> None:
    if len(splits) < 2:
        raise ValueError("need at least 2 splits")
    if any(ppm <= 0 for _, ppm in splits):
        raise ValueError("split weights must be positive")
    if sum(ppm for _, ppm in splits) != buckets:
        raise ValueError(f"split weights must sum to {buckets}")
    if len({name for name, _ in splits}) != len(splits):
        raise ValueError("split names must be unique")


def group_split(df: DataFrame, group_col: Column | str,
                splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
                seed: str = "split", buckets: int = BUCKETS) -> DataFrame:
    """Adds a ``split`` column: the name of the split the row's GROUP
    falls in. ``splits`` is an ordered tuple of (name, weight) with
    weights in ppm summing to ``buckets`` — the group's md5 bucket is
    compared against the cumulative edges in order, so the same
    ordered spec is replayable verbatim in SQL. Every row of a group
    gets the same split by construction (the bucket is a function of
    the group value alone)."""
    _check(splits, buckets)
    b = hash_bucket(group_col, seed, buckets)
    edge = 0
    expr = None
    for name, ppm in splits[:-1]:
        edge += ppm
        cond = b < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = expr.otherwise(F.lit(splits[-1][0]))
    return df.withColumn("split", expr)


def duckdb_group_split_case(expr: str,
                            splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
                            seed: str = "split", buckets: int = BUCKETS) -> str:
    """Exact DuckDB mirror of :func:`group_split`'s CASE over the same
    md5 ppm bucket of ``expr``."""
    _check(splits, buckets)
    b = duckdb_hash_bucket_sql(expr, seed, buckets)
    edge, arms = 0, []
    for name, ppm in splits[:-1]:
        edge += ppm
        arms.append(f"WHEN {b} < {edge} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{splits[-1][0]}' END"


def split_leakage(pairs: DataFrame, assignment: DataFrame,
                  id_col: str = "doc_id",
                  split_col: str = "split") -> DataFrame:
    """Cross-split leakage audit — the check a group-aware split still
    needs: :func:`group_split` guarantees every row of a GROUP lands in
    one split, but near-duplicate documents in DIFFERENT groups (same
    article syndicated on two domains) can still straddle the
    train/eval boundary and inflate eval scores. Given the confirmed
    near-dup ``pairs`` (id_a, id_b, ...payload) and the corpus's split
    ``assignment`` (id, split), returns the pairs whose endpoints fall
    in different splits, annotated with both splits.

    Scale shape (the audit must not cost another corpus pass): the
    confirmed-pair set is tiny relative to the corpus (it is the output
    of the LSH-band + exact-confirm funnel), so its endpoint-id set is
    broadcast into ONE semi-join that narrows the assignment projection
    to only the docs appearing in any pair; the splits are then
    attached to the pairs by two broadcast hash joins over that
    narrowed (driver-sized) table. One full scan of ``assignment``,
    zero shuffles of it (plan-asserted in tests/test_splits.py: no
    SortMergeJoin, no Exchange on the assignment side). Reference
    lineage: this is the probe phase of the reference's corpus/query
    membership pipeline (/root/reference/src/SkmerSplitter.cpp:91-151)
    with the Bloom filter replaced by the exact broadcast id set —
    exactness matters because the audit's output is a report, not a
    prefilter.

    ``pairs`` is barriered before the fan-out: this operator references
    it three times (the pair rows themselves + both endpoint-id
    projections), and without the barrier Catalyst inlines the whole
    upstream funnel into every branch (measured 78 KB -> 5 KB optimized
    plan on the contract query — the urls.py expression-duplication
    lesson). The barrier is ``localCheckpoint(eager=True)`` rather than
    ``persist()`` (ADVICE r4): a persisted plan is pinned in the JVM's
    CacheManager for session lifetime, so a resident audit service
    calling this per batch would leak one cache entry per distinct
    input plan. A local checkpoint materializes once (same single
    funnel execution), truncates lineage to an RDD scan, and its
    backing blocks are reference-tracked by the ContextCleaner — they
    are freed when the result DataFrame is garbage-collected, with no
    unpersist obligation pushed onto the caller. The materialized set
    is funnel-tiny by the operator's own contract."""
    pairs = pairs.localCheckpoint(eager=True)
    ids = (
        pairs.select(F.col("id_a").alias("_id"))
        .unionByName(pairs.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    small = (
        assignment.select(F.col(id_col).alias("_id"),
                          F.col(split_col).alias("_split"))
        .join(F.broadcast(ids), "_id")
    )
    a = small.select(F.col("_id").alias("id_a"), F.col("_split").alias("split_a"))
    b = small.select(F.col("_id").alias("id_b"), F.col("_split").alias("split_b"))
    return (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .where(F.col("split_a") != F.col("split_b"))
    )
