#!/usr/bin/env python
"""spark-submit QUERY-phase entry point: load persisted sketch state and
probe an input against it — the reference's second phase
(``/root/reference/src/main.cpp:149-284``: reopen the corpus filters,
stream query k-mers through them, emit positioned answers) as its own
Spark application, sharing nothing with the build job but the state dir.

Usage:
  spark-submit --py-files dist/bloomfilter_multithread_spark.zip \
      scripts/submit_probe.py --state <state-dir> --input <parquet-or-synth:N> \
      [--sketch bloom_key] [--key text] [--out <parquet-dir>]

Build/probe as two separate applications is the production shape: the
build runs once over the corpus, the (much cheaper) probe runs per
query batch against the persisted state — exactly why the state is
written executor-side and loaded by name (parquet predicate pushdown
fetches one spec's blob, not the whole state)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--sketch", default="bloom_key")
    ap.add_argument("--key", default="text")
    ap.add_argument("--out", default=None,
                    help="optional parquet dir for the per-conv hit counts")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bloomfilter_multithread_spark.operators.build import (
        load_sketches,
        with_might_contain,
    )
    from bloomfilter_multithread_spark.sources.io import read_table

    spark = SparkSession.builder.appName("sketch-probe").getOrCreate()
    if args.input.startswith("synth:"):
        from bloomfilter_multithread_spark.sources.transcripts import synth_transcripts

        df = synth_transcripts(spark, n_convs=int(args.input.split(":", 1)[1]), seed=42)
    else:
        df = read_table(spark, args.input)

    sk = load_sketches(spark, args.state, [args.sketch])[args.sketch]
    probed = with_might_contain(df, args.key, sk)
    hits = (
        probed.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("might_contain").cast("long")).alias("n_might_contain"),
        )
    )
    if args.out:
        hits.write.mode("overwrite").parquet(args.out)
    total = hits.agg(
        F.sum("n_rows").alias("rows"), F.sum("n_might_contain").alias("hits")
    ).collect()[0]
    print(f"probed {total['rows']} rows against '{args.sketch}': "
          f"{total['hits']} might-contain hits")
    spark.stop()


if __name__ == "__main__":
    main()
