"""Deterministic hash sampling (operators/sampling.py): partitioning /
retry invariance, fraction accuracy, sample-join consistency (the
coordinated-sampling property), stratified thresholds, and the
shuffle-free plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bloomfilter_multithread_spark.operators.sampling import (
    BUCKETS,
    duckdb_hash_bucket_sql,
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
    weighted_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


def _ids(df, col="doc_id"):
    return sorted(r[0] for r in df.select(col).collect())


class TestHashSample:
    def test_partitioning_and_rerun_invariance(self, docs):
        """The sample is a function of key VALUES only — identical under
        any partition count (the stand-in for task retry / AQE replan,
        where df.sample's partition-seeded RNG would drift)."""
        a = _ids(hash_sample(docs.repartition(2), "doc_id", 0.2, seed="s1"))
        b = _ids(hash_sample(docs.repartition(16), "doc_id", 0.2, seed="s1"))
        c = _ids(hash_sample(docs, "doc_id", 0.2, seed="s1"))
        assert a == b == c and len(a) > 0

    def test_fraction_accuracy(self, docs):
        n = docs.count()
        got = hash_sample(docs, "doc_id", 0.2, seed="s1").count()
        sigma = math.sqrt(0.2 * 0.8 / n)
        assert abs(got / n - 0.2) <= 4 * sigma

    def test_seeds_give_different_samples(self, docs):
        a = set(_ids(hash_sample(docs, "doc_id", 0.2, seed="s1")))
        b = set(_ids(hash_sample(docs, "doc_id", 0.2, seed="s2")))
        assert a != b

    def test_nested_fractions(self, docs):
        """Same seed, smaller fraction ⇒ subset — lets a pipeline grow a
        sample (1% → 10%) without redrawing what it already processed."""
        small = set(_ids(hash_sample(docs, "doc_id", 0.05, seed="s1")))
        big = set(_ids(hash_sample(docs, "doc_id", 0.3, seed="s1")))
        assert small <= big

    def test_sample_join_consistency(self, spark, sf_dir):
        """Coordinated sampling: sampling BOTH sides of a join by the join
        key at the same (seed, fraction), then joining, equals sampling
        the join — no key's pair is ever half-dropped."""
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        so = hash_sample(orders, "o_custkey", 0.3, seed="j")
        sc = hash_sample(cust, "c_custkey", 0.3, seed="j")
        join_of_samples = so.join(sc, so.o_custkey == sc.c_custkey).count()
        sample_of_join = hash_sample(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            "o_custkey", 0.3, seed="j",
        ).count()
        assert join_of_samples == sample_of_join > 0

    def test_plan_is_shuffle_free_single_stage(self, spark, sf_dir):
        fresh = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = hash_sample(fresh, "doc_id", 0.2)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        # '*(1) Filter' = the filter fused into whole-stage-codegen stage 1,
        # directly over the file scan
        assert "*(1) Filter" in plan and "FileScan parquet" in plan

    def test_bad_fraction_raises(self, docs):
        with pytest.raises(ValueError, match="fraction"):
            hash_sample(docs, "doc_id", 1.5)


class TestStratifiedSample:
    FR = {"click": 0.5, "view": 0.25, "error": 0.05}

    def test_per_stratum_matches_plain_sample(self, events):
        """Each stratum's rows are exactly the plain hash_sample of that
        stratum at its own fraction (same seed ⇒ same buckets)."""
        s = stratified_hash_sample(events, "event_id", "event_type", self.FR, seed="st")
        for etype, frac in self.FR.items():
            got = _ids(s.where(F.col("event_type") == etype), "event_id")
            want = _ids(
                hash_sample(events.where(F.col("event_type") == etype),
                            "event_id", frac, seed="st"), "event_id")
            assert got == want

    def test_default_zero_drops_unlisted_strata(self, events):
        s = stratified_hash_sample(events, "event_id", "event_type", self.FR, seed="st")
        kept = {r[0] for r in s.select("event_type").distinct().collect()}
        assert kept <= set(self.FR)

    def test_default_fraction_applies(self, events):
        s = stratified_hash_sample(events, "event_id", "event_type", self.FR,
                                   default=1.0, seed="st")
        n_unlisted = s.where(~F.col("event_type").isin(*self.FR)).count()
        exact = events.where(~F.col("event_type").isin(*self.FR)).count()
        assert n_unlisted == exact > 0


class TestWeightedSample:
    RATE = 1 / 400  # docs with n_chars >= 400 kept with certainty

    def test_certainty_cap(self, docs):
        s = weighted_hash_sample(docs, "doc_id", "n_chars", self.RATE, seed="w")
        n_heavy = docs.where(F.col("n_chars") >= 400).count()
        kept_heavy = s.where(F.col("n_chars") >= 400).count()
        assert kept_heavy == n_heavy > 0

    def test_inclusion_tracks_weight(self, docs):
        """Empirical inclusion fraction of the light (w < 200) vs the
        mid (200 ≤ w < 400) band straddles the analytic probabilities."""
        s = weighted_hash_sample(docs, "doc_id", "n_chars", self.RATE, seed="w")
        light_all = docs.where(F.col("n_chars") < 200).count()
        light_kept = s.where(F.col("n_chars") < 200).count()
        mid_all = docs.where(F.col("n_chars").between(200, 399)).count()
        mid_kept = s.where(F.col("n_chars").between(200, 399)).count()
        assert light_kept / light_all < mid_kept / mid_all

    def test_expected_fraction(self, docs):
        rows = docs.select("doc_id", "n_chars").collect()
        exp = sum(min(1.0, r["n_chars"] * self.RATE) for r in rows) / len(rows)
        got = weighted_hash_sample(docs, "doc_id", "n_chars", self.RATE, seed="w").count()
        sigma = math.sqrt(exp * (1 - exp) / len(rows))
        assert abs(got / len(rows) - exp) <= 4 * sigma + 0.01

    def test_partitioning_invariance(self, docs):
        a = _ids(weighted_hash_sample(docs.repartition(3), "doc_id", "n_chars",
                                      self.RATE, seed="w"))
        b = _ids(weighted_hash_sample(docs.repartition(17), "doc_id", "n_chars",
                                      self.RATE, seed="w"))
        assert a == b and len(a) > 0

    def test_negative_rate_raises(self, docs):
        with pytest.raises(ValueError, match="rate"):
            weighted_hash_sample(docs, "doc_id", "n_chars", -0.1)


def test_duckdb_bucket_mirror_is_bit_exact(docs, sf_dir):
    """The whole contract-oracle story rests on Spark and DuckDB agreeing
    on every bucket value — check all of them, not a sample."""
    import duckdb

    got = {
        r["doc_id"]: r["b"]
        for r in docs.select("doc_id", hash_bucket("doc_id", seed="x").alias("b")).collect()
    }
    con = duckdb.connect()
    rel = con.sql(
        f"SELECT doc_id, {duckdb_hash_bucket_sql('doc_id', seed='x')} AS b "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict(rel.fetchall())
    assert got == want and len(got) > 0
    assert all(0 <= b < BUCKETS for b in got.values())


class TestGroupSampleTopK:
    def _sample(self, docs, n, seed="gs"):
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        return {
            (r["source"], r["doc_id"]): r["sample_rank"]
            for r in group_sample_topk(docs, "doc_id", "source", n=n, seed=seed)
            .select("source", "doc_id", "sample_rank").collect()
        }

    def test_fixed_size_per_group(self, docs):
        got = self._sample(docs, 5)
        sizes = {}
        for (src, _), rank in got.items():
            sizes[src] = max(sizes.get(src, 0), rank)
        group_counts = {r["source"]: r["c"] for r in
                        docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
        for src, c in group_counts.items():
            assert sizes[src] == min(5, c)
        assert all(1 <= r <= 5 for r in got.values())

    def test_nesting_smaller_is_prefix_of_larger(self, docs):
        s3, s7 = self._sample(docs, 3), self._sample(docs, 7)
        assert set(s3) <= set(s7)
        assert all(s7[k] == v for k, v in s3.items())  # same ranks

    def test_partitioning_invariance(self, docs):
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        a = self._sample(docs, 4)
        b = {
            (r["source"], r["doc_id"]): r["sample_rank"]
            for r in group_sample_topk(docs.repartition(17), "doc_id", "source",
                                       n=4, seed="gs")
            .select("source", "doc_id", "sample_rank").collect()
        }
        assert a == b

    def test_seed_changes_sample(self, docs):
        assert self._sample(docs, 5, "a") != self._sample(docs, 5, "b")

    def test_prefix_cut_commutes(self, spark, docs):
        """Bottom-k commutes with a coarse cutoff on its own hash order."""
        from bloomfilter_multithread_spark.operators.dedup import md5_hash_col
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        h = md5_hash_col(F.concat(F.col("doc_id").cast("string"), F.lit("gs")))
        thinned = docs.where(h < F.lit(1 << 31))
        direct = self._sample(docs, 2)
        two_phase = {
            (r["source"], r["doc_id"]): r["sample_rank"]
            for r in group_sample_topk(thinned, "doc_id", "source", n=2, seed="gs")
            .select("source", "doc_id", "sample_rank").collect()
        }
        assert direct == two_phase

    def test_prethin_param_identity(self, docs):
        """prethin_cutoff is the built-in form of the prefix cut: the
        two-phase result must equal the one-phase result whenever every
        group keeps >= n rows under the cut (half the hash space keeps
        far more than 2 per source on this fixture)."""
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        direct = self._sample(docs, 2)
        two_phase = {
            (r["source"], r["doc_id"]): r["sample_rank"]
            for r in group_sample_topk(docs, "doc_id", "source", n=2, seed="gs",
                                       prethin_cutoff=1 << 31)
            .select("source", "doc_id", "sample_rank").collect()
        }
        assert direct == two_phase

    def test_prethin_skew_fixture(self, spark):
        """Skew shape: one group with 50,000 rows next to groups of 60.
        The pre-thin must (a) drop the hot group's rows BEFORE the
        rank shuffle — survivor count ~ cutoff/2^32 of the input, within
        5x of expectation — and (b) leave the sampled output identical
        to the unthinned run."""
        from bloomfilter_multithread_spark.operators.dedup import md5_hash_col
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        rows = [(i, "hot") for i in range(50_000)] + [
            (100_000 + i, f"cold{i % 10}") for i in range(600)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        n = 5
        # cold groups have 60 rows; keep the cut >= n rows per cold group
        # with huge margin: 2^32 * (1/4) keeps ~15 of 60
        cutoff = 1 << 30
        h = md5_hash_col(F.concat(F.col("doc_id").cast("string"), F.lit("sk")))
        survivors = df.where(h < F.lit(cutoff)).count()
        expect = len(rows) * cutoff / (1 << 32)
        assert expect / 5 <= survivors <= expect * 5
        direct = {
            (r["source"], r["doc_id"], r["sample_rank"])
            for r in group_sample_topk(df, "doc_id", "source", n=n, seed="sk").collect()
        }
        thinned = {
            (r["source"], r["doc_id"], r["sample_rank"])
            for r in group_sample_topk(df, "doc_id", "source", n=n, seed="sk",
                                       prethin_cutoff=cutoff).collect()
        }
        assert direct == thinned
        assert sum(1 for s, _, _ in direct if s == "hot") == n

    def test_prethin_filter_precedes_shuffle(self, docs):
        """The cutoff must appear as a Filter below the window Exchange
        (map-side, fused into the scan stage) — that's the whole point."""
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        s = group_sample_topk(docs, "doc_id", "source", n=2, seed="gs",
                              prethin_cutoff=1 << 31)
        plan = s._jdf.queryExecution().executedPlan().toString()
        exch = plan.find("Exchange hashpartitioning")
        assert exch != -1
        # a Filter containing the cutoff literal occurs AFTER (i.e. below,
        # in printed tree order) the exchange line
        assert str(1 << 31) in plan[exch:]

    def test_bad_n_raises(self, docs):
        from bloomfilter_multithread_spark.operators.sampling import group_sample_topk

        with pytest.raises(ValueError):
            group_sample_topk(docs, "doc_id", "source", n=0)
        with pytest.raises(ValueError):
            group_sample_topk(docs, "doc_id", "source", n=2, prethin_cutoff=0)


class TestPrioritySample:
    def test_estimator_near_total_and_deterministic(self, docs):
        """DLT priority sampling: the subset-sum estimator over the k
        sampled rows approximates the exact total weight (relative error
        ~1/sqrt(k) — 4/sqrt(k) slack), heavy rows always enter, and the
        whole output is deterministic across reruns/partitionings."""
        import math

        from pyspark.sql import functions as F

        from bloomfilter_multithread_spark.operators.sampling import priority_sample

        k = 64
        s = priority_sample(docs, "doc_id", "n_chars", k=k, seed="t")
        rows = s.collect()
        assert len(rows) == k
        est = rows[0]["est_milli"] / 1000.0
        exact = docs.agg(F.sum("n_chars")).first()[0]
        assert abs(est - exact) / exact <= 4 / math.sqrt(k), (est, exact)
        # deterministic under a different partitioning
        again = priority_sample(docs.repartition(13), "doc_id", "n_chars",
                                k=k, seed="t").collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
        # the heaviest row has the top inclusion odds: w_max / u >= w_max,
        # so it outranks any row with w <= w_max * u_min — check it's in
        w_max = docs.agg(F.max("n_chars")).first()[0]
        sampled_w = {r["w"] for r in rows}
        assert max(sampled_w) >= 0.5 * w_max

    def test_topk_plan_is_bounded_heap(self, docs):
        from bloomfilter_multithread_spark.operators.sampling import priority_sample

        s = priority_sample(docs, "doc_id", "n_chars", k=16)
        plan = s._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan  # no global sort stage


class TestMixtureSample:
    def test_allocate_quotas_largest_remainder(self):
        from bloomfilter_multithread_spark.operators.sampling import allocate_quotas

        q = allocate_quotas(60, {"a": 0.35, "b": 0.25, "c": 0.18,
                                 "d": 0.12, "e": 0.10})
        assert sum(q.values()) == 60
        # floors are 21/15/10/7/6 = 59; the one leftover seat goes to
        # the largest remainder (c: .8)
        assert q == {"a": 21, "b": 15, "c": 11, "d": 7, "e": 6}
        # deterministic name tie-break when remainders tie exactly
        q2 = allocate_quotas(1, {"x": 0.5, "y": 0.5})
        assert q2 == {"x": 1, "y": 0}
        with pytest.raises(ValueError):
            allocate_quotas(10, {"a": 0.2, "b": 0.2})

    def test_quotas_hit_exactly_and_groups_absent_are_dropped(self, docs):
        from bloomfilter_multithread_spark.operators.sampling import mixture_sample

        q = {"src0": 7, "src1": 3, "src2": 0}
        s = mixture_sample(docs, "doc_id", "source", q, seed="m")
        per = dict((r[0], r[1]) for r in
                   s.groupBy("source").count().collect())
        assert per == {"src0": 7, "src1": 3}

    def test_nested_across_quota_raise(self, docs):
        """Raising one source's quota extends its sample instead of
        resampling it (hash order is a fixed total order per group)."""
        from bloomfilter_multithread_spark.operators.sampling import mixture_sample

        small = mixture_sample(docs, "doc_id", "source",
                               {"src0": 5, "src1": 8}, seed="m")
        big = mixture_sample(docs, "doc_id", "source",
                             {"src0": 12, "src1": 8}, seed="m")
        assert set(_ids(small)) <= set(_ids(big))
        # and the untouched source's sample is identical
        s1 = _ids(small.where("source = 'src1'"))
        b1 = _ids(big.where("source = 'src1'"))
        assert s1 == b1

    def test_partitioning_invariance(self, docs):
        from bloomfilter_multithread_spark.operators.sampling import mixture_sample

        q = {"src0": 9, "src3": 4}
        a = mixture_sample(docs, "doc_id", "source", q, seed="m")
        b = mixture_sample(docs.repartition(17), "doc_id", "source", q, seed="m")
        assert sorted(map(tuple, a.select("doc_id", "sample_rank").collect())) == \
            sorted(map(tuple, b.select("doc_id", "sample_rank").collect()))

    def test_agrees_with_group_sample_when_quotas_equal(self, docs):
        """mixture_sample with a constant quota IS group_sample_topk —
        the two operators share one hash order."""
        from bloomfilter_multithread_spark.operators.sampling import (
            group_sample_topk,
            mixture_sample,
        )

        srcs = [r[0] for r in docs.select("source").distinct().collect()]
        m = mixture_sample(docs, "doc_id", "source",
                           {s: 4 for s in srcs}, seed="z")
        g = group_sample_topk(docs, "doc_id", "source", n=4, seed="z")
        assert sorted(map(tuple, m.select("doc_id", "sample_rank").collect())) == \
            sorted(map(tuple, g.select("doc_id", "sample_rank").collect()))


class TestTemperatureMixture:
    def test_quotas_sum_to_exact_budget(self, docs):
        from bloomfilter_multithread_spark.operators.sampling import (
            temperature_mixture,
        )

        out = temperature_mixture(docs, "doc_id", "lang", total_frac_bp=4000)
        n = docs.count()
        assert out.count() == n * 4000 // 10000  # largest remainder is exact
        # quota column is consistent: per group, rows == min(quota, group size)
        per = {r["grp"]: (r["q"], r["rows"]) for r in
               out.groupBy("grp").agg(F.first("quota").alias("q"),
                                      F.count("*").alias("rows")).collect()}
        sizes = {r["lang"]: r["c"] for r in
                 docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        for g, (q, rows) in per.items():
            assert rows == min(q, sizes[g])

    def test_upweights_low_resource_groups(self, docs):
        """alpha=0.5 moves sample shares toward uniform: the largest
        group's sampled share is LESS than its raw share, the smallest
        group's is MORE (the whole point of temperature sampling)."""
        from bloomfilter_multithread_spark.operators.sampling import (
            temperature_mixture,
        )

        out = temperature_mixture(docs, "doc_id", "lang", total_frac_bp=4000)
        total = out.count()
        n = docs.count()
        raw = {r["lang"]: r["c"] / n for r in
               docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        samp = {r["grp"]: r["c"] / total for r in
                out.groupBy("grp").agg(F.count("*").alias("c")).collect()}
        big = max(raw, key=raw.get)
        small = min(raw, key=raw.get)
        assert raw[big] > raw[small]  # the fixture is actually skewed
        assert samp[big] < raw[big]
        assert samp[small] > raw[small]

    def test_nested_in_budget(self, docs):
        """A bigger budget EXTENDS each group's sample (same hash order
        prefix) — mixture re-weighting preserves sample overlap."""
        from bloomfilter_multithread_spark.operators.sampling import (
            temperature_mixture,
        )

        a = set(_ids(temperature_mixture(docs, "doc_id", "lang", 2000), "key"))
        b = set(_ids(temperature_mixture(docs, "doc_id", "lang", 4000), "key"))
        assert a < b

    def test_uniform_groups_get_equal_quotas(self, docs):
        """On the uniform `source` column every quota is identical —
        temperature scaling of a flat distribution is a no-op."""
        from bloomfilter_multithread_spark.operators.sampling import (
            temperature_mixture,
        )

        out = temperature_mixture(docs, "doc_id", "source", total_frac_bp=4000)
        quotas = {r["quota"] for r in out.select("quota").distinct().collect()}
        assert len(quotas) == 1
