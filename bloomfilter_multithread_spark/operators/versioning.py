"""Snapshot diff — corpus-version bookkeeping for incremental pipelines.

A crawl/training-data pipeline re-materializes its corpus repeatedly
(crawl N vs crawl N+1, pre- vs post-curation, yesterday's Iceberg
snapshot vs today's). The operational question before re-running
anything expensive downstream (re-signaturing, re-embedding,
re-tokenizing) is the DIFF: which keys were added, removed, or changed
— and everything unchanged should be skipped by the incremental paths
(exactly the contract `incremental_neardup` consumes).

Scale shape: each side collapses to a slim (key, digest) projection
computed MAP-SIDE (`row_digest` is a codegen'd md5 over the compared
columns — the full rows never enter an exchange), then ONE co-keyed
full-outer join on the key. At 100 TB with both snapshots bucketed by
key the join is co-located; otherwise it is a single 2-column-payload
shuffle per side. No collect, no driver loops.

Digest caveat (documented, not hidden): `row_digest` casts compared
columns to string, so floating-point columns must be quantized by the
caller first (the repo-wide floor-milli idiom) — raw DOUBLE→string
rendering is not engine-portable. Integer / string / boolean / date
columns are portable as-is.

Reference context: the reference engine rebuilds its Bloom state from
scratch every run (src/main.cpp:30-59 build loop); this operator is
what lets the Spark re-expression NOT do that — feed `added ∪ changed`
to the sketch builders and subtract `removed` via the counting-Bloom
retraction path (sketches/cbf.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field / null sentinels for the digest concat; \x01 cannot appear in
# the fixture data and \x00 is not a valid value string, so the
# concatenation is prefix-free in practice
_FIELD_SEP = "\x01"
_NULL_SENTINEL = "\x00"


def row_digest(cols: list[str | Column]) -> Column:
    """md5 digest of the listed columns' values (null-safe: NULL maps
    to a sentinel distinct from any value string). Computed map-side in
    whole-stage codegen — this is the only payload a snapshot ships
    into the diff join."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"),
                   F.lit(_NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws(_FIELD_SEP, *parts))


def snapshot_diff(old_df: DataFrame, new_df: DataFrame,
                  key_cols: list[str], compare_cols: list[str],
                  include_unchanged: bool = False) -> DataFrame:
    """Per-key diff of two snapshots of the same logical table: one row
    per key present in either side, with ``status`` in
    ``added`` (new only) / ``removed`` (old only) / ``changed`` (both,
    digest differs) / ``unchanged`` (both, digest equal —
    filtered out unless ``include_unchanged``).

    Keys must be unique within each snapshot (the usual primary-key
    contract; duplicate keys make "changed" ill-defined)."""
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    o = old_df.select(*key_cols, row_digest(compare_cols).alias("_old_digest"))
    n = new_df.select(*key_cols, row_digest(compare_cols).alias("_new_digest"))
    status = (
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("removed"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = o.join(n, key_cols, "full_outer").select(*key_cols,
                                                   status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def snapshot_diff_summary(old_df: DataFrame, new_df: DataFrame,
                          key_cols: list[str],
                          compare_cols: list[str]) -> DataFrame:
    """One-row counts per status (including unchanged) — the dashboard/
    gating aggregate: 'is this delta small enough for the incremental
    path, or did the upstream change under us?'."""
    d = snapshot_diff(old_df, new_df, key_cols, compare_cols,
                      include_unchanged=True)
    return d.agg(
        F.count(F.when(F.col("status") == "added", 1)).alias("n_added"),
        F.count(F.when(F.col("status") == "removed", 1)).alias("n_removed"),
        F.count(F.when(F.col("status") == "changed", 1)).alias("n_changed"),
        F.count(F.when(F.col("status") == "unchanged", 1)).alias("n_unchanged"),
    )


def duckdb_snapshot_diff_sql(old_sql: str, new_sql: str,
                             key_cols: list[str],
                             compare_cols: list[str]) -> str:
    """Semantic oracle for :func:`snapshot_diff` (NOT a digest mirror:
    DuckDB compares the column tuples directly with null-safe equality,
    so a digest-logic bug on the Spark side cannot hide in a shared
    mirror)."""
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in key_cols)
    keys = ", ".join(
        f"COALESCE(o.{k}, n.{k}) AS {k}" for k in key_cols
    )
    same = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in compare_cols
    )
    return f"""
        WITH old_side AS (SELECT *, TRUE AS _op FROM ({old_sql})),
        new_side AS (SELECT *, TRUE AS _np FROM ({new_sql})),
        joined AS (
            SELECT {keys},
                   CASE WHEN o._op IS NULL THEN 'added'
                        WHEN n._np IS NULL THEN 'removed'
                        WHEN {same} THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old_side o FULL OUTER JOIN new_side n ON {on}
        )
        SELECT * FROM joined WHERE status <> 'unchanged'
    """


def cbf_apply_snapshot_delta(old_df: DataFrame, new_df: DataFrame,
                             key_cols: list[str], value_col: str,
                             params: dict | None = None,
                             cbf_old=None):
    """Incremental sketch maintenance from a snapshot delta — the
    operational answer to "a new crawl landed; update the seen-filter
    WITHOUT rescanning 100 TB": diff the snapshots (slim digest join),
    then build delta sketches over ONLY the added/changed/removed rows
    and fold them into the existing state —

        CBF(new) == CBF(old) + build(inserts) - build(retracts)

    where inserts = new-side values of added∪changed keys and retracts =
    old-side values of removed∪changed keys. Counting-Bloom counters are
    exact multiset counters, so the identity is EXACT: the maintained
    COUNTER ARRAY equals a from-scratch build's counter array slot for
    slot (the wire blob may differ in FORM ONLY — subtract returns the
    dense form while a routed build stays block-local; `.counters` is
    the canonical view) — pinned by tests/test_versioning.py and the
    `sketch_delta_update` contract query's in-query witness.

    ``cbf_old`` is the persisted state from the previous run (load via
    ``plans.checkpoint``); when None it is built from ``old_df`` (the
    bootstrap run). The delta selection is two left-semi joins against
    the diff's slim (key, status) output, so the expensive value scan +
    sketch build touch delta rows only."""
    from .build import SketchSpec, build_sketches

    params = params or {"m_slots": 1 << 18, "k": 5, "block_slots": 1 << 14}
    d = snapshot_diff(old_df, new_df, key_cols, [value_col])
    ins_keys = d.where(F.col("status").isin("added", "changed")).select(*key_cols)
    ret_keys = d.where(F.col("status").isin("removed", "changed")).select(*key_cols)
    inserts = new_df.join(ins_keys, key_cols, "left_semi")
    retracts = old_df.join(ret_keys, key_cols, "left_semi")
    spec = [SketchSpec("d", "cbf", value_col, dict(params))]
    empty = spec[0].make  # an all-empty delta side yields no partials
    ins = build_sketches(inserts, spec, route_for="d").get("d") or empty()
    ret = build_sketches(retracts, spec, route_for="d").get("d") or empty()
    if cbf_old is None:
        cbf_old = build_sketches(old_df, spec, route_for="d").get("d") or empty()
    return cbf_old.merge(ins).subtract(ret)
