"""Deterministic synthetic transcript generator (FIXTURES.md §1-2).

Schema = BASELINE.json input_hint exactly:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp).  Everything is a pure JVM expression seeded through
``xxhash64`` — any row is reproducible in isolation from
(seed, conv_id, turn_idx), there is no Python in the generation path,
and the same call is identical across partitionings and cluster sizes.

Zipf-ish conversation sizes (bounded Pareto via inverse-CDF of a
hash-uniform) exercise the salted-repartition skew path; tool names are
heavy-tailed (top 5 get ~80%) as the count-min fixture; per-turn ts
deltas are log-normal (Box-Muller over two hash-uniforms) as the
t-digest/KLL fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VOCAB_SIZE = 5000
N_TOOLS = 50


def _u01(*cols):
    """Deterministic uniform(0,1) from hashed columns (strictly positive)."""
    return (F.pmod(F.xxhash64(*cols), F.lit(2**31 - 1)) + 1.0) / float(2**31)


def synth_transcripts(spark: SparkSession, n_convs: int, seed: int = 42,
                      zipf_s: float = 1.2, max_turns: int = 2000,
                      avg_tokens: int = 60, partitions: int | None = None) -> DataFrame:
    """~8.5 turns/conversation on average with the default params."""
    sd = F.lit(seed)
    convs = spark.range(n_convs, numPartitions=partitions).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_no"),
    )
    # bounded-Pareto sizes: 1 + floor(u^(-1/s)) capped — heavy upper tail
    u_size = _u01(sd, F.lit("size"), F.col("conv_no"))
    convs = convs.withColumn(
        "n_turns",
        F.least(F.lit(max_turns), (F.floor(F.pow(u_size, F.lit(-1.0 / zipf_s)))).cast("int") + 1),
    )
    turns = convs.select(
        "conv_id", "conv_no", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )

    h = F.xxhash64(sd, F.col("conv_no"), F.col("turn_idx"))
    # role: turn 0 is 'system' for ~5% of convs; ~10% 'tool'; else user/assistant cycle
    sys_conv = F.pmod(F.xxhash64(sd, F.lit("sys"), F.col("conv_no")), F.lit(100)) < 5
    tool_turn = F.pmod(h, F.lit(100)) < 10
    role = (
        F.when((F.col("turn_idx") == 0) & sys_conv, "system")
        .when(tool_turn, "tool")
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, "user")
        .otherwise("assistant")
    )

    # text: 5..(5+avg_tokens*2-1) tokens; token = f(seed, conv, turn, i)
    n_tok = (F.pmod(h, F.lit(avg_tokens * 2)) + 5).cast("int")
    token = lambda i: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64(sd, F.col("conv_no"), F.col("turn_idx"), i), F.lit(VOCAB_SIZE)),
    )
    text = F.array_join(F.transform(F.sequence(F.lit(0), n_tok - 1), token), " ")

    # tool: heavy-tailed over 50 names — top 5 take 80% of calls
    r = F.pmod(F.xxhash64(sd, F.lit("tool"), F.col("conv_no"), F.col("turn_idx")), F.lit(100))
    tool_id = F.when(r < 80, F.pmod(r, F.lit(5))).otherwise(
        F.pmod(F.xxhash64(sd, F.lit("t2"), h), F.lit(N_TOOLS - 5)) + 5
    )
    tool = F.when(tool_turn, F.format_string("tool-%02d", tool_id)).otherwise(F.lit(None))

    # ts: conv start + cumulative log-normal deltas (Box-Muller, deterministic)
    u1 = _u01(sd, F.lit("bm1"), F.col("conv_no"), F.col("turn_idx"))
    u2 = _u01(sd, F.lit("bm2"), F.col("conv_no"), F.col("turn_idx"))
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    delta_s = F.exp(F.lit(0.0) + F.lit(1.5) * z)  # lognormal(mu=0 -> median 1s, sigma=1.5)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    start_s = F.pmod(F.xxhash64(sd, F.lit("start"), F.col("conv_no")), F.lit(30 * 86400))

    out = (
        turns.withColumn("role", role)
        .withColumn("text", text)
        .withColumn("tool", tool)
        .withColumn("delta_s", delta_s)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1767225600)  # 2026-01-01 00:00:00 UTC
                + start_s
                + F.sum("delta_s").over(w)
            ),
        )
        .select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "role", "text", "tool", "ts")
    )
    return out


def synth_query_set(spark: SparkSession, corpus: DataFrame, present_frac: float = 0.1,
                    absent_convs: int = 200, seed: int = 43) -> DataFrame:
    """FIXTURES.md §2 probe table: a 'present' partition copied verbatim
    from the first ``present_frac`` of corpus conversations (the analog of
    inputs/query.txt being an exact prefix of the corpus — zero-FN golden),
    plus an 'absent' partition with a disjoint vocabulary ('-zz' suffix on
    every token) for FPR measurement.  Adds expected_present:boolean."""
    present = (
        corpus.where(
            F.pmod(F.xxhash64(F.lit(7), F.col("conv_id")), F.lit(100))
            < int(present_frac * 100)
        ).withColumn("expected_present", F.lit(True))
    )
    absent = (
        synth_transcripts(spark, n_convs=absent_convs, seed=seed)
        .withColumn(
            "text",
            F.array_join(
                F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit("-zz"))), " "
            ),
        )
        .withColumn("conv_id", F.concat(F.lit("absent-"), F.col("conv_id")))
        .withColumn("expected_present", F.lit(False))
    )
    return present.unionByName(absent)
