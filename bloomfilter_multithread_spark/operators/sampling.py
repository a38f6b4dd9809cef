"""Deterministic hash-based sampling — the 100 TB sampling path.

A training-data pipeline samples constantly (eval holdouts, ablation
subsets, per-source quotas, debugging slices).  At cluster scale the
sampling operator must be:

- **stateless and shuffle-free**: a map-side filter fused into the scan
  (whole-stage codegen, predicate on a hash of the row's own key) — no
  RNG state, no exchange, no driver coordination;
- **retry/replan-safe**: Spark's ``df.sample`` draws from a per-partition
  RNG seeded by the partition index, so its output changes under task
  retry, AQE re-coalescing, or a different input split — a hash of the
  KEY VALUE is invariant to all of those;
- **coordinated**: the same key hashes identically everywhere, so
  sampling two tables by their join key keeps the join intact
  (sample-then-join == join-then-sample, gated by the
  ``consistent_sample_join`` contract query), and re-running a month
  later extends the same sample instead of drawing a fresh one;
- **cross-engine mirrorable**: the bucket function is the md5-prefix
  integer (``dedup.md5_hash_col`` idiom), which DuckDB reproduces
  bit-exactly — so the contract oracle pins row-level sample membership,
  not just counts.

Reference context: the reference engine has no sampling surface at all
(/root/reference/src — scan → extract → filter build/probe only); this
module is part of the LLM-pipeline companion surface (SURVEY.md §2's
"beyond the reference" families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_hash_col

BUCKETS = 1_000_000  # ppm resolution: fraction quantum 1e-6


def hash_bucket(col: Column | str, seed: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from the VALUE of ``col``
    (cast to string) salted with ``seed``.  Distinct seeds give
    independent samples; the same seed gives the same sample anywhere —
    any engine, any partitioning, any retry."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash_col(F.concat(c.cast("string"), F.lit(seed))) % F.lit(buckets)


def duckdb_hash_bucket_sql(expr: str, seed: str = "", buckets: int = BUCKETS) -> str:
    """Exact DuckDB mirror of :func:`hash_bucket` for oracle SQL."""
    return (
        f"(('0x' || substr(md5(CAST({expr} AS VARCHAR) || '{seed}'), 1, 8))::BIGINT"
        f" % {buckets})"
    )


def hash_sample(df: DataFrame, key: Column | str, fraction: float,
                seed: str = "", buckets: int = BUCKETS) -> DataFrame:
    """Keep rows whose key-bucket falls below ``fraction`` — a pure
    map-side filter (no shuffle, no state; the plan is scan+filter in one
    codegen stage, asserted in tests/test_sampling.py)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction in [0, 1]")
    return df.where(hash_bucket(key, seed, buckets) < F.lit(int(round(fraction * buckets))))


def weighted_hash_sample(df: DataFrame, key: Column | str, weight: Column | str,
                         rate: float, seed: str = "", buckets: int = BUCKETS) -> DataFrame:
    """Deterministic Poisson (Bernoulli-per-row) sampling with inclusion
    probability ``min(1, weight * rate)`` — sample ∝ quality score /
    document length / dedup-cluster size, the standard weighted-subset
    primitive for training-data curation.  Still a stateless map-side
    filter on the same md5 bucket: the threshold just becomes a per-row
    expression of the weight column.  Rows with weight ≥ 1/rate are kept
    with certainty (threshold capped at ``buckets``)."""
    if rate < 0:
        raise ValueError("rate >= 0")
    w = F.col(weight) if isinstance(weight, str) else weight
    thresh = F.least(
        F.lit(buckets).cast("long"),
        F.floor(w.cast("double") * F.lit(float(rate) * buckets)).cast("long"),
    )
    return df.where(hash_bucket(key, seed, buckets) < thresh)


def stratified_hash_sample(df: DataFrame, key: Column | str, strata: Column | str,
                           fractions: dict[str, float], default: float = 0.0,
                           seed: str = "", buckets: int = BUCKETS) -> DataFrame:
    """Per-stratum sampling fractions (per-source quotas, class
    rebalancing) as ONE codegen'd CASE threshold — still a stateless
    map-side filter, still deterministic per key."""
    for frac in fractions.values():
        if not 0.0 <= frac <= 1.0:
            raise ValueError("fractions in [0, 1]")
    s = F.col(strata) if isinstance(strata, str) else strata
    thresh = F.lit(int(round(default * buckets)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(s == F.lit(value), F.lit(int(round(frac * buckets)))).otherwise(thresh)
    return df.where(hash_bucket(key, seed, buckets) < thresh)


def group_sample_topk(df: DataFrame, key: Column | str, group: Column | str,
                      n: int, seed: str = "", key_order: Column | str | None = None,
                      prethin_cutoff: int | None = None) -> DataFrame:
    """Fixed-SIZE per-group sample: the ``n`` rows of each group with the
    smallest key-hash (bottom-k by hash order — the KMV idea applied to
    row selection). Complements the fixed-RATE samplers above where a
    quota is wanted per stratum regardless of its size ("5 eval docs per
    language"), and inherits their determinism: no RNG state, stable
    under retries/partitioning, and NESTED — the same seed's size-n
    sample is a prefix of its size-m sample for n < m (bottom-k order is
    fixed), so growing a holdout never resamples it.

    Adds ``sample_rank`` (1-based position in the group's hash order).
    Ties on the 32-bit hash are broken by the key value itself
    (``key_order`` defaults to ``key``), keeping the output total-order
    deterministic on both engines.

    Scale: one hash shuffle on ``group`` + per-group sort (the standard
    rank-filter shape). For pathologically hot groups pass
    ``prethin_cutoff``: a map-side prefix filter ``where(h < cutoff)``
    on the SAME 32-bit hash order, fused into the scan BEFORE the
    shuffle, so a hot group ships ~cutoff/2^32 of its rows instead of
    all of them. Bottom-k commutes with a prefix filter on its own
    order, so the two-phase result is IDENTICAL to the one-phase result
    whenever the cut keeps at least n rows in every group — choose
    cutoff >> n * 2^32 / min_group_rows (e.g. 10x). It must be the raw
    hash prefix, NOT the ppm-bucket filter of ``hash_sample`` (h mod
    1e6 does not prefix this order). Identity + skew behavior are
    pinned by tests/test_sampling.py::test_group_sample_prethin_*.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n >= 1")
    g = F.col(group) if isinstance(group, str) else group
    tie = key_order if key_order is not None else key
    tie = F.col(tie) if isinstance(tie, str) else tie
    h = md5_hash_col(F.concat((F.col(key) if isinstance(key, str) else key)
                              .cast("string"), F.lit(seed)))
    if prethin_cutoff is not None:
        if not 0 < prethin_cutoff <= 1 << 32:
            raise ValueError("prethin_cutoff in (0, 2^32]")
        df = df.where(h < F.lit(int(prethin_cutoff)))
    w = Window.partitionBy(g).orderBy(h.asc(), tie.asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= n)
    )


def duckdb_group_sample_sql(table: str, key: str, group: str, n: int,
                            seed: str = "", cols: str | None = None) -> str:
    """Exact mirror of :func:`group_sample_topk` (same md5 order, same
    tiebreak)."""
    cols = cols or f"{key}, {group}"
    h = f"('0x' || substr(md5(CAST({key} AS VARCHAR) || '{seed}'), 1, 8))::BIGINT"
    return f"""
        SELECT * FROM (
            SELECT {cols},
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY {group} ORDER BY {h}, {key}) AS BIGINT)
                     AS sample_rank
            FROM {table})
        WHERE sample_rank <= {n}
    """


def priority_sample(df: DataFrame, key: Column | str, weight: Column | str,
                    k: int, seed: str = "", buckets: int = BUCKETS) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): a weighted
    size-k sample supporting UNBIASED subset-sum estimates.

    Each row gets priority ``pri = w / u`` with ``u`` the deterministic
    hash-uniform in (0, 1] (``(hash_bucket + 1) / buckets`` — same
    retry/partitioning-invariant, cross-engine-mirrorable uniform the
    rest of this module uses); the sample is the top k priorities, and
    with ``tau`` = the (k+1)-th priority, each sampled row's estimator
    ``max(w, tau)`` sums to an unbiased estimate of the TOTAL weight
    (heavy rows enter with probability ~1 and count exactly; light rows
    are up-weighted by their inclusion odds).

    Scale shape: priorities are a pure projection; top-(k+1) compiles to
    TakeOrderedAndProject — a bounded per-partition heap, k+1 rows per
    partition on the final exchange, never a global sort.

    Returns the k sampled rows as (key, w, pri_floor, est_milli) where
    ``est_milli`` (constant across rows) is the floor-milli subset-sum
    estimate of df's total weight — all integers, so the oracle compare
    is exact (the underlying doubles are bit-identical cross-engine:
    IEEE division of identical operands)."""
    kc = F.col(key) if isinstance(key, str) else key
    wc = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    u = (hash_bucket(kc, seed, buckets) + F.lit(1)).cast("double") / F.lit(float(buckets))
    pri = df.select(
        kc.alias("key"), wc.alias("w"), (wc / u).alias("pri")
    )
    topk1 = pri.orderBy(F.desc("pri"), F.asc("key")).limit(k + 1)
    tau = topk1.agg(F.min("pri").alias("tau"))
    samp = topk1.orderBy(F.desc("pri"), F.asc("key")).limit(k)
    return (
        samp.crossJoin(F.broadcast(tau))
        .withColumn("est_item", F.greatest(F.col("w"), F.col("tau")))
        .withColumn("est_milli",
                    F.floor(F.sum("est_item").over(Window.partitionBy()) * 1000).cast("long"))
        .select(
            "key",
            F.col("w").cast("long").alias("w"),
            F.floor("pri").cast("long").alias("pri_floor"),
            "est_milli",
        )
    )


def duckdb_priority_sample_sql(table: str, key: str, weight: str, k: int,
                               seed: str = "", buckets: int = BUCKETS) -> str:
    """Exact DuckDB mirror of :func:`priority_sample`."""
    u = f"(({duckdb_hash_bucket_sql(key, seed, buckets)} + 1) / {float(buckets)})"
    return f"""
        WITH pri AS (
            SELECT {key} AS key, CAST({weight} AS DOUBLE) AS w,
                   CAST({weight} AS DOUBLE) / {u} AS pri
            FROM {table}
        ),
        topk1 AS (SELECT * FROM pri ORDER BY pri DESC, key LIMIT {k + 1}),
        tau AS (SELECT MIN(pri) AS tau FROM topk1),
        samp AS (SELECT * FROM topk1 ORDER BY pri DESC, key LIMIT {k})
        SELECT key, CAST(w AS BIGINT) AS w,
               CAST(FLOOR(pri) AS BIGINT) AS pri_floor,
               (SELECT CAST(FLOOR(SUM(GREATEST(w, (SELECT tau FROM tau))) * 1000)
                       AS BIGINT) FROM samp) AS est_milli
        FROM samp
    """


def allocate_quotas(total: int, proportions: dict[str, float]) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``total`` rows
    across groups with target ``proportions`` (must sum to ~1): each
    group gets floor(total * p), then the leftover seats go to the
    largest fractional remainders (ties broken by group name, so the
    allocation is fully deterministic). Runs driver-side at plan time —
    the quotas are plain integers that both engines inline as literals,
    exactly like the IVF pivot literals."""
    if total < 0:
        raise ValueError("total >= 0")
    if not proportions:
        raise ValueError("proportions must be non-empty")
    s = sum(proportions.values())
    if not 0.999 <= s <= 1.001:
        raise ValueError(f"proportions sum to {s}, expected ~1")
    exact = {g: total * p for g, p in proportions.items()}
    base = {g: int(exact[g]) for g in exact}
    left = total - sum(base.values())
    order = sorted(exact, key=lambda g: (-(exact[g] - base[g]), g))
    for g in order[:left]:
        base[g] += 1
    return base


def mixture_sample(df: DataFrame, key: Column | str, group: Column | str,
                   quotas: dict[str, int], seed: str = "") -> DataFrame:
    """Data-MIXING sampler: a fixed per-group QUOTA of rows (one quota
    per source/domain, usually from :func:`allocate_quotas`), selected
    by the module's shared md5 hash order. This is the operator that
    composes a training mixture ("50% web, 30% code, 20% books, total N
    docs") — the fixed-RATE samplers can't hit an exact per-source row
    budget and :func:`group_sample_topk` forces one n for every group.

    Inherits every determinism property of the family: no RNG state,
    retry/partitioning-invariant, cross-engine mirrorable, and NESTED
    per group (raising one source's quota extends its sample instead of
    resampling — the hash order is a fixed total order, so mixture
    re-weighting between pipeline runs only adds/removes the tail of
    each source's prefix, maximizing sample overlap across experiments).

    Groups absent from ``quotas`` are dropped (quota 0). Scale shape:
    identical to ``group_sample_topk`` — one hash shuffle on ``group``
    plus a per-group rank filter; for a pathologically hot source apply
    the same raw-hash ``prethin_cutoff`` prefix filter before calling
    (bottom-k commutes with a prefix of its own order)."""
    for g, q in quotas.items():
        if q < 0:
            raise ValueError(f"quota for {g!r} must be >= 0")
    gc = F.col(group) if isinstance(group, str) else group
    kc = F.col(key) if isinstance(key, str) else key
    h = md5_hash_col(F.concat(kc.cast("string"), F.lit(seed)))
    qcol = F.create_map(
        *[F.lit(x) for g, q in sorted(quotas.items()) for x in (g, q)]
    )[gc]
    w = Window.partitionBy(gc).orderBy(h.asc(), kc.asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= F.coalesce(qcol, F.lit(0)))
    )


def duckdb_mixture_sample_sql(table: str, key: str, group: str,
                              quotas: dict[str, int], seed: str = "",
                              cols: str | None = None) -> str:
    """Exact mirror of :func:`mixture_sample` (same md5 order, same
    tiebreak, quotas inlined as a CASE literal)."""
    cols = cols or f"{key}, {group}"
    h = f"('0x' || substr(md5(CAST({key} AS VARCHAR) || '{seed}'), 1, 8))::BIGINT"
    case = " ".join(
        f"WHEN '{g}' THEN {q}" for g, q in sorted(quotas.items())
    )
    return f"""
        SELECT * FROM (
            SELECT {cols},
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY {group} ORDER BY {h}, {key}) AS BIGINT)
                     AS sample_rank
            FROM {table})
        WHERE sample_rank <= (CASE {group} {case} ELSE 0 END)
    """


def temperature_mixture(df: DataFrame, key: Column | str, group: Column | str,
                        total_frac_bp: int = 4000, seed: str = "") -> DataFrame:
    """Temperature-scaled multilingual/multi-source mixture (the XLM-R
    §3.1 / mT5 alpha-sampling rule at alpha = 0.5): per-group quotas
    proportional to count^alpha — up-weighting small sources relative to
    raw proportions — apportioned by largest remainder to an exact total
    of ``total_frac_bp`` basis points of the corpus, then the rows are
    drawn by the module's shared md5 hash order (nested, coordinated,
    retry-invariant like every sampler here).

    Why alpha = 0.5 exactly: the group weight is ``floor(sqrt(c)*1e6
    + 0.5)`` and IEEE 754 requires sqrt to be correctly rounded, so the
    micro-rounded weights are bit-identical on ANY engine; from there
    everything is integer arithmetic (base = total*w div S, remainders
    compared exactly), making the full apportionment — not just the row
    draw — cross-engine exact.  Other alphas would ride on ``pow``,
    which the standards leave a few ulp of slack.

    The quota computation runs on the per-group COUNTS frame (#groups
    rows): its single-partition window is over that tiny side only —
    the same sanctioned shape as ``priority_sample``'s tau window — and
    the resulting quota table broadcasts back onto the per-group ranked
    corpus (one hash shuffle on ``group``, same as
    :func:`mixture_sample`).

    The QUOTAS always sum to exactly the budget; the drawn row count
    can fall short only if temperature up-weighting assigns some tiny
    group a quota larger than the group itself (each group then yields
    min(quota, size) rows) — at alpha = 0.5 that needs an extreme
    size ratio relative to the budget fraction.

    Returns the sampled rows as (key, group, quota, sample_rank)."""
    if not 0 <= total_frac_bp <= 10000:
        raise ValueError("total_frac_bp in [0, 10000]")
    gc = F.col(group) if isinstance(group, str) else group
    kc = F.col(key) if isinstance(key, str) else key

    counts = df.groupBy(gc.alias("_g")).agg(F.count("*").cast("long").alias("_c"))
    tiny = Window.partitionBy()  # #groups rows only
    q = (
        counts
        .withColumn("_w", F.floor(F.sqrt(F.col("_c")) * F.lit(1e6) + F.lit(0.5))
                    .cast("long"))
        .withColumn("_s", F.sum("_w").over(tiny))
        .withColumn("_n", F.sum("_c").over(tiny))
        .withColumn("_total", F.expr(f"_n * {total_frac_bp}L div 10000L"))
        .withColumn("_base", F.expr("_total * _w div _s"))
        .withColumn("_rem", F.expr("_total * _w - _base * _s"))
        .withColumn("_left", F.col("_total") - F.sum("_base").over(tiny))
        .withColumn(
            "_rr",
            F.row_number().over(
                Window.partitionBy().orderBy(F.desc("_rem"), F.asc("_g"))
            ).cast("long"),
        )
        .select(
            F.col("_g"),
            (F.col("_base")
             + F.when(F.col("_rr") <= F.col("_left"), 1).otherwise(0))
            .cast("long").alias("quota"),
        )
    )
    h = md5_hash_col(F.concat(F.col("key").cast("string"), F.lit(seed)))
    w = Window.partitionBy("grp").orderBy(h.asc(), F.col("key").asc())
    return (
        df.select(kc.alias("key"), gc.alias("grp"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(q), F.col("grp") == F.col("_g"))
        .where(F.col("sample_rank") <= F.col("quota"))
        .select("key", "grp", "quota", "sample_rank")
    )


def duckdb_temperature_mixture_sql(table: str, key: str, group: str,
                                   total_frac_bp: int = 4000,
                                   seed: str = "") -> str:
    """Exact mirror of :func:`temperature_mixture`: same micro-rounded
    sqrt weights, same integer largest-remainder apportionment, same md5
    row order."""
    h = f"('0x' || substr(md5(CAST({key} AS VARCHAR) || '{seed}'), 1, 8))::BIGINT"
    return f"""
        WITH counts AS (
            SELECT {group} AS g, CAST(COUNT(*) AS BIGINT) AS c
            FROM {table} GROUP BY {group}
        ),
        wts AS (
            SELECT g, c, CAST(FLOOR(sqrt(c) * 1e6 + 0.5) AS BIGINT) AS w
            FROM counts
        ),
        tot AS (
            SELECT SUM(w) AS s, SUM(c) * {total_frac_bp} // 10000 AS total
            FROM wts
        ),
        base AS (
            SELECT g, w, total * w // s AS base, total * w - (total * w // s) * s AS rem
            FROM wts, tot
        ),
        quota AS (
            SELECT g,
                   CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, g)
                                         <= (SELECT total FROM tot)
                                            - (SELECT SUM(base) FROM base)
                               THEN 1 ELSE 0 END AS BIGINT) AS quota
            FROM base
        ),
        ranked AS (
            SELECT {key} AS key, {group} AS grp,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY {group} ORDER BY {h}, {key}) AS BIGINT)
                     AS sample_rank
            FROM {table}
        )
        SELECT key, grp, quota, sample_rank
        FROM ranked JOIN quota ON grp = g
        WHERE sample_rank <= quota
    """
