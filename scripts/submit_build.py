#!/usr/bin/env python
"""spark-submit entry point: build + merge + persist sketches over a
transcript table — the cluster deployment form demanded by the north rule
(``spark-submit --py-files dist/bloomfilter_multithread_spark.zip``).

Usage:
  spark-submit --py-files dist/bloomfilter_multithread_spark.zip \
      scripts/submit_build.py --input <parquet-or-iceberg> \
      --state <state-dir> [--bloom-key text] [--capacity 1000000] \
      [--fpr 1e-3] [--blocked] [--route]

On a real cluster add --master/--num-executors etc.; the job itself is
identical — that is the point of the partition-agnostic merge design.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--bloom-key", default="text")
    ap.add_argument("--capacity", type=int, default=1_000_000)
    ap.add_argument("--fpr", type=float, default=1e-3)
    ap.add_argument("--blocked", action="store_true",
                    help="cache-blocked bloom (block=2^21 bits)")
    ap.add_argument("--route", action="store_true",
                    help="route the exchange by hash block (requires --blocked)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_and_persist,
        load_sketches,
    )
    from bloomfilter_multithread_spark.sketches.bloom import optimal_params
    from bloomfilter_multithread_spark.sources.io import read_table

    spark = SparkSession.builder.appName("sketch-build").getOrCreate()
    if args.input.startswith("synth:"):  # deterministic in-job fixture
        from bloomfilter_multithread_spark.sources.transcripts import synth_transcripts

        df = synth_transcripts(spark, n_convs=int(args.input.split(":", 1)[1]), seed=42)
    else:
        df = read_table(spark, args.input)

    m, k = optimal_params(args.capacity, args.fpr)
    bloom_params = {"m_bits": m, "k": k}
    if args.blocked:
        bloom_params["block_bits"] = min(1 << 21, m)
    specs = [
        SketchSpec("bloom_key", "bloom", args.bloom_key, bloom_params),
        SketchSpec("hll_conv", "hll", "conv_id", {"p": 14}),
        SketchSpec("cms_tool", "cms", "tool", {"width": 1 << 14, "depth": 5}),
        SketchSpec("kll_len", "kll", "length(text)", {"k": 200}),
        SketchSpec("td_len", "tdigest", "length(text)", {"delta": 200.0}),
    ]
    build_and_persist(df, specs, args.state,
                      route_for="bloom_key" if args.route and args.blocked else None)
    hll = load_sketches(spark, args.state, ["hll_conv"])["hll_conv"]
    print(f"persisted sketch state at {args.state}; "
          f"distinct-conv estimate = {hll.estimate():.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
