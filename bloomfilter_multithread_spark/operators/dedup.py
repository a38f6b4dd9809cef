"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as DataFrame plans (no driver-side loops,
no collect of data rows) so they scale to 10^9+ documents:

- exact          hash-groupBy on md5(text) — one shuffle on the digest
- minhash_lsh    shingle -> JVM xxhash64 -> n_perm universal-hash mins as
                 codegen aggregates -> band buckets -> bucket self-join ->
                 exact-Jaccard confirm.  Candidate recall is the standard
                 LSH s-curve 1-(1-s^r)^b; the confirm step removes false
                 positives, so precision is exact.
- simhash        token hashes -> per-bit signed sums (64 codegen aggs) ->
                 64-bit signature -> banded buckets -> Hamming confirm
- ngram_jaccard  exact all-pairs Jaccard via distinct-shingle self-join
                 (the brute-force oracle; quadratic in bucket size, use on
                 bounded candidate sets / as correctness baseline)
- embedding      cosine near-dup via random-hyperplane LSH buckets +
                 exact cosine confirm (see similarity.py for primitives)

Skew note: the shingle self-join salts nothing because distinct shingles
are near-unique; the LSH bucket join is the skew point (a hot band =
boilerplate text) — ``max_bucket`` caps pathological buckets explicitly,
the documented trade-off being that docs inside an over-cap bucket skip
candidate generation (they are boilerplate near-everything pairs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.shingles import explode_shingles

# Mersenne prime 2^31-1: universal hashing (a*(h mod p)+b) mod p where
# a,b < p and h folded to [0,p) keeps every product < 2^62 — pure BIGINT
# arithmetic in whole-stage codegen (a 2^61-1 modulus would need
# decimal(38,0), measured ~5x slower)
_P31 = (1 << 31) - 1


def _perm_coeffs(n_perm: int, seed: int) -> tuple[list[int], list[int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P31, size=n_perm, dtype=np.int64).tolist()
    b = rng.integers(0, _P31, size=n_perm, dtype=np.int64).tolist()
    return a, b


# ---------------------------------------------------------------- exact


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_md5, keep_id, dup_count) — keeper = min id per identical text."""
    return df.groupBy(F.md5(text_col).alias("text_md5")).agg(
        F.min(id_col).cast("long").alias("keep_id"),
        F.count("*").cast("long").alias("dup_count"),
    )


def line_dedup_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", line_tokens: int = 10,
                     min_count: int = 3) -> DataFrame:
    """C4-style LINE-level dedup accounting (Raffel et al. 2020 §2.2:
    "we discarded any line that occurred more than [twice] in the data
    set") — the sub-document twin of ``exact_duplicates``, which only
    sees whole documents. "Lines" on this corpus (single-line synthetic
    text) are deterministic non-overlapping ``line_tokens``-token units;
    on real data pass the newline-split exploded frame instead — the
    counting/join core is unit-agnostic.

    Per document: (n_lines, n_dup_lines, n_kept_lines) where a line is
    DUP iff its corpus-wide occurrence count >= ``min_count``.

    Scale shape: the unit explode is a narrow JVM transformation
    (sequence + slice + array_join, no Python); unit text is collapsed
    to md5 BEFORE any exchange, so the corpus-wide count groupBy
    (map-side combined) and the count⋈lines equi-join both carry
    (id, 16-byte digest) rows only. Same two-exchange budget at any
    corpus size; the hot keys are exactly the boilerplate lines the
    operator exists to find, and they arrive pre-combined per map task.
    """
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+").alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    starts = toks.select(
        id_col,
        "_toks",
        "_n",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(line_tokens)
            )
        ).alias("_s"),
    )
    n_line = F.least(F.lit(line_tokens), F.col("_n") - F.col("_s"))
    lines = starts.select(
        id_col,
        F.md5(
            F.array_join(F.slice(F.col("_toks"), F.col("_s") + 1, n_line), " ")
        ).alias("_h"),
    )
    counts = lines.groupBy("_h").agg(F.count("*").cast("long").alias("_cnt"))
    dup = F.col("_cnt") >= F.lit(min_count)
    return (
        lines.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(dup.cast("long")).cast("long").alias("n_dup_lines"),
            F.sum((~dup).cast("long")).cast("long").alias("n_kept_lines"),
        )
    )


def duckdb_line_dedup_sql(table: str, id_col: str = "doc_id",
                          text_col: str = "text", line_tokens: int = 10,
                          min_count: int = 3) -> str:
    """Exact mirror of :func:`line_dedup_stats` (1-based inclusive list
    slicing on both engines — the ``chunk_sliding`` oracle idiom)."""
    k = line_tokens
    return f"""
        WITH t AS (
            SELECT {id_col},
                   regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                   len(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS n
            FROM {table}
        ),
        l AS (
            SELECT {id_col},
                   md5(array_to_string(
                       toks[(g.s + 1):(g.s + LEAST({k}, n - g.s))], ' ')) AS h
            FROM t, LATERAL (
                SELECT unnest(generate_series(0, greatest(n - 1, 0), {k})) AS s) g
        ),
        c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt FROM l GROUP BY h)
        SELECT {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN cnt >= {min_count} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_lines,
               CAST(SUM(CASE WHEN cnt < {min_count} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept_lines
        FROM l JOIN c USING (h) GROUP BY {id_col}
    """


def source_overlap_matrix(df: DataFrame, text_col: str = "text",
                          group_col: str = "source",
                          line_tokens: int = 10) -> DataFrame:
    """Cross-source content-overlap matrix — "how much of source A also
    appears in source B", the provenance report a curation pipeline
    reads before mixing corpora (double-counted content distorts
    mixture weights and leaks eval material between sources).

    Units are the same deterministic non-overlapping ``line_tokens``-
    token chunks as :func:`line_dedup_stats`; a unit "overlaps" two
    sources when its digest occurs in both. Output: one row per
    unordered source pair (source_a <= source_b) with the count of
    shared distinct units; the diagonal (a == b) is each source's own
    distinct-unit count, so the matrix is self-normalizing.

    Scale shape: unit text collapses to md5 BEFORE the one exchange
    (groupBy digest, map-side-combined ``collect_set(source)`` bounded
    by the source cardinality); pair expansion is a higher-order
    transform over the per-digest sorted source array — NO self-join,
    no second scan. The final pair aggregation carries at most
    |sources|^2 rows. Contract: ``group_col`` is a bounded-cardinality
    provenance label (sources, snapshots, crawls) — for unbounded
    groups the |set|^2 expansion is the wrong tool.

    Reference lineage: the reference's q disjoint Bloom filters only
    ever answer "seen anywhere" (main.cpp:119-127); the per-source
    digest sets here answer the refinement "seen WHERE", with the same
    collapse-to-digest-before-exchange discipline."""
    toks = df.select(
        F.col(group_col), F.split(F.trim(F.col(text_col)), r"[ \t\n\x0B\f\r]+").alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    starts = toks.select(
        group_col,
        "_toks",
        "_n",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(line_tokens)
            )
        ).alias("_s"),
    )
    n_unit = F.least(F.lit(line_tokens), F.col("_n") - F.col("_s"))
    units = starts.select(
        F.col(group_col).alias("_src"),
        F.md5(
            F.array_join(F.slice(F.col("_toks"), F.col("_s") + 1, n_unit), " ")
        ).alias("_h"),
    )
    per_digest = units.groupBy("_h").agg(
        F.array_sort(F.collect_set("_src")).alias("_ss")
    )
    # ordered pairs (x, y) with x <= y, diagonal included: for the i-th
    # element (0-based), pair it with itself and everything after it
    pairs = per_digest.select(
        F.explode(
            F.flatten(
                F.transform(
                    "_ss",
                    lambda x, i: F.transform(
                        F.slice(F.col("_ss"), i + 1, F.size("_ss") - i),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("_p")
    )
    return pairs.groupBy(
        F.col("_p.a").alias("source_a"), F.col("_p.b").alias("source_b")
    ).agg(F.count("*").cast("long").alias("shared_units"))


def duckdb_source_overlap_sql(table: str, text_col: str = "text",
                              group_col: str = "source",
                              line_tokens: int = 10) -> str:
    """Exact mirror of :func:`source_overlap_matrix` (distinct
    (digest, source) pairs + ordered self-join — the declarative twin
    of the set-expansion form)."""
    k = line_tokens
    return f"""
        WITH t AS (
            SELECT {group_col} AS src,
                   regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+') AS toks,
                   len(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS n
            FROM {table}
        ),
        l AS (
            SELECT src,
                   md5(array_to_string(
                       toks[(g.s + 1):(g.s + LEAST({k}, n - g.s))], ' ')) AS h
            FROM t, LATERAL (
                SELECT unnest(generate_series(0, greatest(n - 1, 0), {k})) AS s) g
        ),
        lu AS (SELECT DISTINCT src, h FROM l)
        SELECT a.src AS source_a, b.src AS source_b,
               CAST(COUNT(*) AS BIGINT) AS shared_units
        FROM lu a JOIN lu b ON a.h = b.h AND a.src <= b.src
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------- minhash


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       k: int = 5, n_perm: int = 64, seed: int = 42) -> DataFrame:
    """(id, sig: array<long>[n_perm]) — min over the shingle SET of
    (a_i * (h mod p) + b_i) mod p, p = 2^31-1, h = xxhash64(shingle).

    Everything is JVM codegen (pure BIGINT arithmetic): explode ->
    n_perm min() aggregates. No distinct step: min over a multiset
    equals min over its set, so duplicate shingles cannot change any
    signature coordinate — and dropping it removes a full shuffle of
    the exploded rows. The groupBy's map-side partial aggregation
    reduces each partition to one row per doc BEFORE the exchange, so
    the only shuffle is O(docs x n_perm), independent of shingle
    count."""
    a, b = _perm_coeffs(n_perm, seed)
    sh = explode_shingles(df.select(id_col, text_col), text_col, k).select(
        id_col, F.xxhash64("shingle").alias("h64")
    )
    hp = F.pmod(F.col("h64"), F.lit(_P31))
    mins = [
        F.min(F.pmod(hp * F.lit(a[i]) + F.lit(b[i]), F.lit(_P31))).alias(f"m{i}")
        for i in range(n_perm)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"m{i}" for i in range(n_perm)]).alias("sig"))


def band_signatures(sigs: DataFrame, id_col: str = "doc_id", bands: int = 16,
                    max_bucket: int = 1000) -> DataFrame:
    """(_id, band_idx, band_hash) band rows for a signature table — the
    shared LSH bucketing of the self-join (`minhash_lsh_candidates`)
    and the incremental historical-state path (`incremental_neardup`).
    Buckets larger than ``max_bucket`` are dropped (boilerplate skew)."""
    n_perm_col = F.size("sig")
    rows_per_band = (n_perm_col / bands).cast("int")
    banded = (
        sigs.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda bi: F.struct(
                        bi.alias("band_idx"),
                        F.xxhash64(
                            F.to_json(F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band))
                        ).alias("band_hash"),
                    ),
                )
            ).alias("bnd"),
        )
        .select("_id", "bnd.band_idx", "bnd.band_hash")
    )
    wcnt = Window.partitionBy("band_idx", "band_hash")
    return (
        banded.withColumn("_bn", F.count("*").over(wcnt))
        .where(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )


def minhash_lsh_candidates(sigs: DataFrame, id_col: str = "doc_id", bands: int = 16,
                           max_bucket: int = 1000) -> DataFrame:
    """Band the signatures and self-join on (band_idx, band_hash).
    Returns candidate pairs (id_a < id_b). With n_perm=64, bands=16 (r=4),
    the s-curve crosses 0.5 near s≈0.58."""
    banded = band_signatures(sigs, id_col, bands, max_bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def exact_jaccard_pairs(df: DataFrame, pairs: DataFrame | None = None, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard: |A∩B| / (|A|+|B|-|A∩B|) over distinct shingle
    sets, via shingle-equality self-join. If ``pairs`` (id_a,id_b) is
    given, restrict to those candidates (the LSH confirm step); otherwise
    all-pairs (the brute-force oracle). Emits jaccard in basis points."""
    sh = (
        explode_shingles(df.select(id_col, text_col), text_col, k)
        .select(F.col(id_col).alias("_id"), "shingle")
        .distinct()
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    if pairs is not None:
        # candidate-restricted confirm: intersect per CANDIDATE pair —
        # pairs ⋈ shingles(id_a) ⋈ shingles(id_b, same shingle). Work is
        # linear in (candidates x shingles-per-doc). Round 1 computed the
        # full co-shingle self-join first and semi-joined after the
        # aggregation, which is quadratic in co-shingled docs regardless
        # of how few candidates LSH produced.
        common = (
            # duplicate (id_a,id_b) rows would double n_common and inflate
            # jaccard; ids-only distinct is cheap (ADVICE round 2)
            pairs.select("id_a", "id_b").distinct()
            .join(sh.withColumnRenamed("_id", "id_a"), "id_a")
            .join(sh.withColumnRenamed("_id", "id_b"), ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count("*").alias("n_common"))
        )
    out = (
        common.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard_bp",
            F.floor(
                F.col("n_common") * 10000.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                + F.lit(0.5)
            ).cast("long"),
        )
        .where(F.col("jaccard_bp") >= int(threshold * 10000))
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard_bp"
    )


def minhash_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5,
                  n_perm: int = 64, bands: int = 16, threshold: float = 0.8,
                  seed: int = 42) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact confirm.
    Result precision is exact (confirm step); recall follows the LSH
    s-curve for pairs near the threshold."""
    sigs = minhash_signatures(df, id_col, text_col, k, n_perm, seed)
    cands = minhash_lsh_candidates(sigs, id_col, bands)
    return exact_jaccard_pairs(df, cands, id_col, text_col, k, threshold)


# ---------------------------------------------------------------- simhash


def md5_hash_col(col: Column | str, hex_digits: int = 8) -> Column:
    """Cross-engine-mirrorable integer hash: first ``hex_digits`` hex chars
    of md5 as a BIGINT (32 bits at 8 digits). Slower than xxhash64 but has
    an exact DuckDB mirror ``('0x' || substr(md5(x), 1, n))::BIGINT`` for
    driver-oracle parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, hex_digits), 16, 10).cast("long")


def simhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n_bits: int = 63, hasher=None) -> DataFrame:
    """n_bits-bit SimHash over token hashes: bit b of the signature is the
    sign of sum over tokens (with multiplicity) of (2*bit_b(h)-1).
    ``n_bits`` codegen'd conditional sums, one shuffle. Default hasher is
    JVM xxhash64; pass ``md5_hash_col`` for an oracle-mirrorable 32-bit
    variant. Signatures are capped at 63 bits (the BIGINT sign bit is
    unusable for ``1 << b`` arithmetic), so callers asking for 64 get 63
    effective bits — ``simhash_near_dups`` documents how its banding
    absorbs this."""
    hasher = hasher or F.xxhash64
    tok = (
        df.select(id_col, F.explode(F.split(F.trim(text_col), r"[ \t\n\x0B\f\r]+")).alias("tok"))
        .select(id_col, hasher(F.col("tok")).alias("h"))
    )
    sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    agg = tok.groupBy(id_col).agg(*sums)
    sig = sum(
        (F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
         for b in range(n_bits)),
        F.lit(0).cast("long"),
    )
    return agg.select(id_col, sig.alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, bands: int = 4, n_bits: int = 64,
                      hasher=None) -> DataFrame:
    """Near-dups by SimHash: band the n_bits-bit signature into ``bands``
    chunks (pigeonhole: hamming<=bands-1 guarantees a shared band),
    bucket-join, then exact popcount confirm. Returns (id_a, id_b, hamming).

    63-bit clamp: with the default n_bits=64 the signature actually holds
    63 bits (see ``simhash_signatures``), so the last band covers
    width-1 effective bits. The pigeonhole recall guarantee is unaffected
    — the bands still cover every bit the signatures can differ in — and
    the popcount confirm is computed on the full clamped signature on
    both sides, so results are consistent; only the advertised band
    entropy of the last band is one bit lower."""
    sigs = simhash_signatures(df, id_col, text_col,
                              n_bits=min(n_bits, 63), hasher=hasher)
    return banded_hamming_pairs(sigs, id_col, "simhash",
                                max_hamming=max_hamming, bands=bands,
                                n_bits=n_bits)


def banded_hamming_pairs(sigs: DataFrame, id_col: str,
                         sig_col: str = "simhash", max_hamming: int = 3,
                         bands: int = 4, n_bits: int = 64) -> DataFrame:
    """Generic banded Hamming near-dup join over any integer signature
    column — the machinery behind :func:`simhash_near_dups`, shared
    with perceptual media dedup (``multimodal.dhash_signatures``):
    band the signature into ``bands`` chunks (pigeonhole: hamming <=
    bands-1 guarantees a shared band), bucket-equi-join on (band_idx,
    band_val), then confirm with an exact popcount on the full
    signatures. Returns (id_a, id_b, hamming). Exchanges carry only
    (id, signature, band) longs — never the payload the signature was
    derived from."""
    width = n_bits // bands
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.shiftrightunsigned(sig_col, bi * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("band_val"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bnd"),
    ).select("_id", "_sig", "bnd.band_idx", "bnd.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs.select(F.col("id_a").cast("long"), F.col("id_b").cast("long"),
                        F.col("hamming").cast("int"))


# ------------------------------------------------------- DuckDB oracle SQL
# Exact mirrors for the driver correctness gate. The LSH pipelines use an
# exact confirm step, so their output equals these brute-force SQL results
# whenever candidate recall is 1 on the dataset (deterministic: fixed
# seeds, fixed data; asserted by tests/test_entry_contract.py).


def duckdb_jaccard_pairs_sql(table: str = "documents", id_col: str = "doc_id",
                             text_col: str = "text", k: int = 5,
                             threshold: float = 0.8) -> str:
    """Brute-force n-gram-Jaccard pairs >= threshold, bp-rounded exactly
    like ``exact_jaccard_pairs``."""
    from ..functions.shingles import duckdb_shingles_cte

    cte = duckdb_shingles_cte(table, id_col, text_col, k)
    return f"""
        WITH sh AS ({cte}),
        d AS (SELECT DISTINCT {id_col} AS _id, shingle FROM sh),
        sz AS (SELECT _id, COUNT(*) AS n FROM d GROUP BY _id),
        c AS (SELECT a._id AS id_a, b._id AS id_b, COUNT(*) AS n_common
              FROM d a JOIN d b ON a.shingle = b.shingle AND a._id < b._id
              GROUP BY a._id, b._id)
        SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
               CAST(FLOOR(n_common * 10000.0 / (x.n + y.n - n_common) + 0.5) AS BIGINT)
                 AS jaccard_bp
        FROM c JOIN sz x ON c.id_a = x._id JOIN sz y ON c.id_b = y._id
        WHERE FLOOR(n_common * 10000.0 / (x.n + y.n - n_common) + 0.5)
              >= {int(threshold * 10000)}
    """


def duckdb_simhash_pairs_sql(table: str = "documents", id_col: str = "doc_id",
                             text_col: str = "text", n_bits: int = 32,
                             hex_digits: int = 8, max_hamming: int = 3) -> str:
    """Brute-force SimHash near-dup pairs with the md5-based 32-bit hash —
    bit-exact mirror of ``simhash_near_dups(..., hasher=md5_hash_col)``."""
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(n_bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)" for b in range(n_bits)
    )
    return f"""
        WITH tok AS (
            SELECT {id_col} AS _id,
                   ('0x' || substr(md5(t.tok), 1, {hex_digits}))::BIGINT AS h
            FROM (SELECT {id_col},
                         unnest(regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
                  FROM {table}) t
        ),
        sums AS (SELECT _id, {sums} FROM tok GROUP BY _id),
        sig AS (SELECT _id, {sig} AS simhash FROM sums)
        SELECT CAST(a._id AS BIGINT) AS id_a, CAST(b._id AS BIGINT) AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sig a JOIN sig b ON a._id < b._id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def dup_ngram_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5) -> DataFrame:
    """Per-document duplicated-n-gram fraction — the substring-level dedup
    signal (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): the share of a document's distinct word k-grams that
    also occur in at least one OTHER document.

    Plan (100 TB shape — hash-project before every exchange):
      1. explode shingles, project (id, md5(shingle)) and take the
         per-document distinct — the exchange carries a 32-hex-char hash,
         never the shingle text;
      2. ONE window ``count(*) over (partition by h)`` attaches the
         document frequency (after the distinct, count == distinct docs);
      3. per-document aggregate -> (n, n_dup, dup_bp).
    Two hash-key shuffles total, both on fixed-width rows. Production
    would hash to xxhash64 (8 bytes, collision-tolerable); the gated path
    uses md5 because DuckDB reproduces it bit-for-bit (the driver oracle
    groups by the SAME md5, so both engines partition identically).

    ``dup_bp`` is basis points, floor-rounded to an integer so float
    division can never diverge between engines.
    """
    from pyspark.sql import Window

    from ..functions.shingles import explode_shingles

    sh = explode_shingles(df.select(id_col, text_col), text_col, k)
    d = sh.select(id_col, F.md5("shingle").alias("_h")).distinct()
    w = Window.partitionBy("_h")
    c = d.withColumn("_ndocs", F.count("*").over(w))
    return (
        c.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("_ndocs") > 1).cast("long")).alias("n_dup_shingles"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_dup_shingles",
            F.floor(F.lit(10000) * F.col("n_dup_shingles") / F.col("n_shingles"))
            .cast("long")
            .alias("dup_bp"),
        )
    )


def duckdb_dupngram_sql(table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5) -> str:
    """Exact SQL mirror of ``dup_ngram_stats`` (same md5 grouping key,
    same window+aggregate decomposition, same floor-rounded bp)."""
    from ..functions.shingles import duckdb_shingles_cte

    cte = duckdb_shingles_cte(table, id_col, text_col, k)
    return f"""
        WITH sh AS ({cte}),
        d AS (SELECT DISTINCT {id_col}, md5(shingle) AS h FROM sh),
        c AS (SELECT {id_col}, COUNT(*) OVER (PARTITION BY h) AS ndocs FROM d)
        SELECT {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_shingles,
               CAST(FLOOR(10000.0 * SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)
                          / COUNT(*)) AS BIGINT) AS dup_bp
        FROM c GROUP BY {id_col}
    """


def build_neardup_state(hist_df: DataFrame, state_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, n_perm: int = 64, bands: int = 16,
                        seed: int = 42) -> None:
    """Signature + band the historical corpus ONCE and persist the
    MinHash band rows (16 B + hash per (doc, band)) to ``state_dir``.
    This is the only step that ever scans historical text; everything
    after (probe_neardup) touches only the persisted band rows plus the
    texts of confirmed CANDIDATES."""
    band_signatures(
        minhash_signatures(hist_df, id_col, text_col, k, n_perm, seed),
        id_col, bands,
    ).write.mode("overwrite").parquet(state_dir)


def probe_neardup(new_df: DataFrame, state_dir: str, hist_text_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 5, n_perm: int = 64, bands: int = 16,
                  threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """Near-dup detection of a NEW batch against the PERSISTED band
    state written by :func:`build_neardup_state` — history is never
    re-signatured. The batch computes only its own signatures, equi-joins
    its bands against the loaded state (bucketed join on (band_idx,
    band_hash) — never a cross product) and exactly confirms the
    candidates. ``hist_text_df`` supplies historical TEXT for the
    confirm step only; exact_jaccard_pairs restricts shingling to
    candidate ids, so at 10^12 turns the per-batch cost is
    O(batch + candidates), not O(history).

    Returns (id_old, id_new, jaccard_bp) with id_old ∈ hist, id_new ∈
    new. Precision is exact (confirm); recall follows the LSH s-curve,
    same seed ⇒ same permutations on both sides across runs."""
    spark = new_df.sparkSession
    hist_bands = spark.read.parquet(state_dir)
    new_bands = band_signatures(
        minhash_signatures(new_df, id_col, text_col, k, n_perm, seed),
        id_col, bands,
    )
    cands = (
        hist_bands.alias("h")
        .join(
            new_bands.alias("n"),
            (F.col("h.band_idx") == F.col("n.band_idx"))
            & (F.col("h.band_hash") == F.col("n.band_hash")),
        )
        .select(F.col("h._id").alias("id_a"), F.col("n._id").alias("id_b"))
        .distinct()
    )
    both = hist_text_df.select(id_col, text_col).union(
        new_df.select(id_col, text_col)
    )
    return exact_jaccard_pairs(both, cands, id_col, text_col, k, threshold).select(
        F.col("id_a").alias("id_old"), F.col("id_b").alias("id_new"), "jaccard_bp"
    )


def incremental_neardup(hist_df: DataFrame, new_df: DataFrame, state_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, n_perm: int = 64, bands: int = 16,
                        threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """Corpus-growth near-dup: build-once + probe composition. If
    ``state_dir`` already holds committed band state (parquet _SUCCESS
    marker), it is REUSED as-is — history is not rescanned and the
    state is not rewritten (ADVICE r3: the previous version re-built
    state on every call, contradicting this contract); otherwise
    :func:`build_neardup_state` writes it once. Then
    :func:`probe_neardup` runs the new batch against the state."""
    import os

    if not os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        build_neardup_state(hist_df, state_dir, id_col, text_col, k,
                            n_perm, bands, seed)
    return probe_neardup(new_df, state_dir, hist_df, id_col, text_col, k,
                         n_perm, bands, threshold, seed)


def duckdb_incremental_pairs_sql(table: str = "documents", id_col: str = "doc_id",
                                 text_col: str = "text", k: int = 5,
                                 threshold: float = 0.8) -> str:
    """Exact cross-set (even-historical × odd-new) Jaccard pairs —
    oracle of :func:`incremental_neardup` on the parity split (precision
    exact by the confirm; recall 1 for pairs far above the s-curve, as
    the planted fixture's are)."""
    from ..functions.shingles import duckdb_shingles_cte

    cte = duckdb_shingles_cte(table, id_col, text_col, k)
    return f"""
        WITH sh AS ({cte}),
        d AS (SELECT DISTINCT {id_col} AS _id, shingle FROM sh),
        sz AS (SELECT _id, COUNT(*) AS n FROM d GROUP BY _id),
        c AS (SELECT a._id AS id_old, b._id AS id_new, COUNT(*) AS n_common
              FROM d a JOIN d b ON a.shingle = b.shingle
              WHERE a._id % 2 = 0 AND b._id % 2 = 1
              GROUP BY a._id, b._id)
        SELECT CAST(id_old AS BIGINT) AS id_old, CAST(id_new AS BIGINT) AS id_new,
               CAST(FLOOR(n_common * 10000.0 / (x.n + y.n - n_common) + 0.5) AS BIGINT)
                 AS jaccard_bp
        FROM c JOIN sz x ON c.id_old = x._id JOIN sz y ON c.id_new = y._id
        WHERE FLOOR(n_common * 10000.0 / (x.n + y.n - n_common) + 0.5)
              >= {int(threshold * 10000)}
    """
