"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a sketch-engine pipeline shaped to be exactly
SQL-reproducible (SURVEY.md §5.2.7): approximate sketches are used as
prefilters / runtime-verified bounds, with an exact confirm step so the
final rows equal the DuckDB oracle deterministically.

Patterns:
- bloom prefilter + exact confirm  ≡ semi-join      (zero FN makes the
  candidate set a superset; the confirm join removes false positives)
- CMS candidates + exact confirm   ≡ GROUP BY HAVING (overcount-only)
- estimate-within-bound            → boolean column that is
  deterministically True, alongside exact aggregates
Quantile outputs are emitted as integer "cents/millis" (floor(q*100+0.5))
so float rounding can never diverge between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------
# flagship: corpus/query shingle membership — the reference's own pipeline
# (build Bloom over corpus k-mers, probe a query set; SURVEY.md §3.1-3.2)
# re-expressed over the documents table.
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    from bloomfilter_multithread_spark.functions.shingles import explode_shingles
    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_sketches,
        with_might_contain,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = _read(spark, sf_dir, "documents")
    corpus = docs.where("doc_id % 10 != 0")
    query = docs.where("doc_id % 10 = 0")

    corpus_sh = explode_shingles(corpus, "text", k=5)
    bloom = build_sketches(
        corpus_sh, [SketchSpec("b", "bloom", "shingle", {"m_bits": 1 << 22, "k": 5})]
    )["b"]

    query_sh = explode_shingles(query, "text", k=5)
    probed = with_might_contain(query_sh, "shingle", bloom)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.col("might_contain").cast("long")).alias("n_candidate_hits"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def _q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom prefilter + exact semi-join confirm ≡ IN-subquery.

    The reference's probe is a lossy broadcast left-semi join
    (SkmerSplitter.cpp:130-137); with the exact confirm it becomes lossless.
    """
    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_sketches,
        with_might_contain,
    )

    orders = _read(spark, sf_dir, "orders").where("o_totalprice > 200000")
    bloom = build_sketches(
        orders, [SketchSpec("b", "bloom", "o_orderkey", {"m_bits": 1 << 20, "k": 5})]
    )["b"]
    li = _read(spark, sf_dir, "lineitem")
    cand = with_might_contain(li, "l_orderkey", bloom).where("might_contain")
    return (
        cand.join(F.broadcast(orders), cand.l_orderkey == orders.o_orderkey, "left_semi")
        .select("l_orderkey")
        .distinct()
    )


def _q_bloom_zero_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-false-negative witness: probe a foreign key against a Bloom of
    its parent key — every probe must hit (reference all-ones golden,
    main.cpp:276-281)."""
    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_sketches,
        with_might_contain,
    )

    cust = _read(spark, sf_dir, "customer")
    bloom = build_sketches(
        cust, [SketchSpec("b", "bloom", "c_custkey", {"m_bits": 1 << 20, "k": 5})]
    )["b"]
    orders = _read(spark, sf_dir, "orders")
    probed = with_might_contain(orders, "o_custkey", bloom)
    return probed.agg(
        F.count("*").cast("long").alias("n_probed"),
        F.sum(F.col("might_contain").cast("long")).alias("n_hits"),
    )


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate vs exact distinct; emits the exact count plus a
    bound-check boolean that the sketch guarantees True."""
    from bloomfilter_multithread_spark.operators.build import SketchSpec, build_sketches

    li = _read(spark, sf_dir, "lineitem")
    hll = build_sketches(li, [SketchSpec("h", "hll", "l_orderkey", {"p": 14})])["h"]
    est, bound = hll.estimate(), hll.rel_error_bound()
    return li.agg(F.countDistinct("l_orderkey").cast("long").alias("exact_distinct")).select(
        "exact_distinct",
        (F.abs(F.lit(est) - F.col("exact_distinct")) / F.col("exact_distinct")
         <= F.lit(4 * bound)).alias("within_bound"),
    )


def _q_cms_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS candidates (overcount-only ⇒ superset) + exact confirm
    ≡ GROUP BY HAVING count >= T."""
    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_sketches,
        with_cms_estimate,
    )

    threshold = 80
    ev = _read(spark, sf_dir, "events")
    cms = build_sketches(ev, [SketchSpec("c", "cms", "user_id", {"width": 1 << 14, "depth": 5})])["c"]
    candidates = with_cms_estimate(ev.select("user_id").distinct(), "user_id", cms, "est").where(
        F.col("est") >= threshold
    )
    exact = (
        ev.join(F.broadcast(candidates.select("user_id")), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .where(F.col("n_events") >= threshold)
    )
    return exact.select("user_id", "n_events")


def _q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles (integer cents — float-rounding-proof) + KLL
    rank-bound boolean verified against the exact values."""
    from bloomfilter_multithread_spark.operators.build import SketchSpec, build_sketches

    li = _read(spark, sf_dir, "lineitem")
    kll = build_sketches(li, [SketchSpec("k", "kll", "l_extendedprice", {"k": 200})])["k"]
    n = li.count()
    checks = []
    for q in (0.25, 0.5, 0.75):
        est = kll.quantile(q)
        # exact rank of the estimate must be within eps of q
        rank = li.where(F.col("l_extendedprice") <= est).count() / n
        checks.append(abs(rank - q) <= 2 * kll.rank_error_bound())
    exact = li.selectExpr(
        "percentile(l_extendedprice, 0.25) as q25",
        "percentile(l_extendedprice, 0.50) as q50",
        "percentile(l_extendedprice, 0.75) as q75",
    )
    return exact.select(
        F.floor(F.col("q25") * 100 + F.lit(0.5)).cast("long").alias("p25_cents"),
        F.floor(F.col("q50") * 100 + F.lit(0.5)).cast("long").alias("p50_cents"),
        F.floor(F.col("q75") * 100 + F.lit(0.5)).cast("long").alias("p75_cents"),
        F.lit(all(checks)).alias("kll_within_bound"),
    )


def _q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomfilter_multithread_spark.operators.build import SketchSpec, build_sketches

    ev = _read(spark, sf_dir, "events")
    td = build_sketches(ev, [SketchSpec("t", "tdigest", "value", {"delta": 200.0})])["t"]
    n = ev.where("value is not null").count()
    checks = []
    for q in (0.1, 0.5, 0.9):
        est = td.quantile(q)
        rank = ev.where(F.col("value") <= est).count() / n
        checks.append(abs(rank - q) <= 0.02)
    exact = ev.selectExpr(
        "percentile(value, 0.1) as q10",
        "percentile(value, 0.5) as q50",
        "percentile(value, 0.9) as q90",
    )
    return exact.select(
        F.floor(F.col("q10") * 1000 + F.lit(0.5)).cast("long").alias("p10_milli"),
        F.floor(F.col("q50") * 1000 + F.lit(0.5)).cast("long").alias("p50_milli"),
        F.floor(F.col("q90") * 1000 + F.lit(0.5)).cast("long").alias("p90_milli"),
        F.lit(all(checks)).alias("tdigest_within_bound"),
    )


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), keeper = min doc_id."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").cast("long").alias("keep_id"), F.count("*").cast("long").alias("dup_count"))
    )


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )


def _q_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle derivation parity — counts per document (k-mer analog)."""
    from bloomfilter_multithread_spark.functions.shingles import explode_shingles

    docs = _read(spark, sf_dir, "documents")
    return (
        explode_shingles(docs, "text", k=5)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.countDistinct("shingle").cast("long").alias("n_distinct_shingles"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_semijoin": _q_bloom_semijoin,
        "bloom_zero_fn": _q_bloom_zero_fn,
        "hll_distinct": _q_hll_distinct,
        "cms_heavy_users": _q_cms_heavy_users,
        "kll_quantiles": _q_kll_quantiles,
        "tdigest_quantiles": _q_tdigest_quantiles,
        "dedup_exact": _q_dedup_exact,
        "token_count": _q_token_count,
        "shingle_stats": _q_shingle_stats,
    }


def oracle_sql() -> dict[str, str]:
    from bloomfilter_multithread_spark.functions.shingles import duckdb_shingles_cte

    sh_cte = duckdb_shingles_cte("documents", "doc_id", "text", 5)
    return {
        "bloom_semijoin": """
            SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)
        """,
        "bloom_zero_fn": """
            SELECT COUNT(*) AS n_probed, COUNT(*) AS n_hits FROM orders
        """,
        "hll_distinct": """
            SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct, TRUE AS within_bound
            FROM lineitem
        """,
        "cms_heavy_users": """
            SELECT user_id, COUNT(*) AS n_events FROM events
            GROUP BY user_id HAVING COUNT(*) >= 80
        """,
        "kll_quantiles": """
            SELECT CAST(FLOOR(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) AS BIGINT) AS p25_cents,
                   CAST(FLOOR(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) AS BIGINT) AS p50_cents,
                   CAST(FLOOR(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) AS BIGINT) AS p75_cents,
                   TRUE AS kll_within_bound
            FROM lineitem
        """,
        "tdigest_quantiles": """
            SELECT CAST(FLOOR(quantile_cont(value, 0.1) * 1000 + 0.5) AS BIGINT) AS p10_milli,
                   CAST(FLOOR(quantile_cont(value, 0.5) * 1000 + 0.5) AS BIGINT) AS p50_milli,
                   CAST(FLOOR(quantile_cont(value, 0.9) * 1000 + 0.5) AS BIGINT) AS p90_milli,
                   TRUE AS tdigest_within_bound
            FROM events
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "token_count": r"""
            SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "shingle_stats": f"""
            WITH sh AS ({sh_cte})
            SELECT doc_id, COUNT(*) AS n_shingles,
                   COUNT(DISTINCT shingle) AS n_distinct_shingles
            FROM sh GROUP BY doc_id
        """,
    }
