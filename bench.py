#!/usr/bin/env python
"""Bench harness — prints ONE JSON line.

Measures, on local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1):
  1. wall time of every __spark_entry__.queries() headline query,
  2. sketch build+merge throughput: parquet scan -> 5-sketch single-pass
     mapInArrow build -> executor-side tree merge, over (a) lineitem and
     (b) a deterministic synthetic transcript table (~5.5M turns,
     materialized once to $SPARK_GRAFT_BENCH_DIR and reused),
  3. scaling evidence (north rule, sandbox protocol from BASELINE.md):
     the same transcript job in fresh subprocess JVMs at local[N] and
     local[4N] cores (N = CPUS/4); efficiency = (tps_4N / tps_N) / 4.
     Python workers are warmed (package imports) before timing and the
     median of 3 timed builds is reported — amortized steady state, as
     on a long-running cluster.

Worker mode (internal): ``bench.py --scale-worker <cores>`` prints one
JSON line for the standard transcript job at that parallelism.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1000000"))  # ~5.5M turns
BENCH_DIR = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/spark_graft_bench")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _session(cores: int):
    from bloomfilter_multithread_spark.sources.io import get_spark

    spark = get_spark(app=f"bench-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores, driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _specs():
    from bloomfilter_multithread_spark.operators.build import SketchSpec
    from bloomfilter_multithread_spark.sketches.bloom import optimal_params

    m, k = optimal_params(6_000_000, 1e-3)
    return [
        SketchSpec("bloom_text", "bloom", "text", {"m_bits": m, "k": k}),
        SketchSpec("hll_conv", "hll", "conv_id", {"p": 14}),
        SketchSpec("cms_tool", "cms", "tool", {"width": 1 << 14, "depth": 5}),
        SketchSpec("kll_len", "kll", "length(text)", {"k": 200}),
        SketchSpec("td_len", "tdigest", "length(text)", {"delta": 200.0}),
    ]


def ensure_bench_input(spark) -> str:
    path = os.path.join(BENCH_DIR, f"transcripts_{N_CONVS}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from bloomfilter_multithread_spark.sources.transcripts import synth_transcripts

        synth_transcripts(spark, n_convs=N_CONVS, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _warm_workers(spark, cores: int) -> None:
    import pyarrow as pa

    def warm(batches):
        import bloomfilter_multithread_spark.operators.build  # noqa: F401 preload
        for _ in batches:
            pass
        yield pa.RecordBatch.from_pydict({"n": [0]}, schema=pa.schema([("n", pa.int64())]))

    spark.range(cores * 8, numPartitions=cores * 8).mapInArrow(warm, "n long").collect()


def transcript_build_job(spark, cores: int, trials: int = 3) -> tuple[int, float]:
    """(turns, median seconds) for parquet-scan -> build -> merge."""
    from bloomfilter_multithread_spark.operators.build import build_sketches

    path = ensure_bench_input(spark)
    df = spark.read.parquet(path)
    n = df.count()
    _warm_workers(spark, cores)
    times = []
    for _ in range(trials):
        t0 = time.time()
        sk = build_sketches(df, _specs())
        times.append(time.time() - t0)
        assert sk["hll_conv"].estimate() > 0
    return n, statistics.median(times)


def _scale_worker(cores: int) -> None:
    spark = _session(cores)
    n, dt = transcript_build_job(spark, cores)
    spark.stop()
    print(json.dumps({"turns": n, "sec": round(dt, 3), "tps": round(n / dt, 1)}))


def main() -> None:
    import __spark_entry__ as entrymod

    spark = _session(CPUS)
    results: dict[str, float] = {}

    _warm_workers(spark, CPUS)
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.collect()
        results[name] = round(time.time() - t0, 3)

    # throughput: lineitem 5-sketch single pass (parquet scan included)
    from bloomfilter_multithread_spark.operators.build import SketchSpec, build_sketches

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_li = li.count()
    t0 = time.time()
    build_sketches(
        li,
        [
            SketchSpec("b", "bloom", "l_orderkey", {"m_bits": 1 << 24, "k": 7}),
            SketchSpec("h", "hll", "l_orderkey", {"p": 14}),
            SketchSpec("c", "cms", "l_suppkey", {"width": 1 << 14, "depth": 5}),
            SketchSpec("k", "kll", "l_extendedprice", {"k": 200}),
            SketchSpec("t", "tdigest", "l_extendedprice", {"delta": 200.0}),
        ],
    )
    li_sec = time.time() - t0
    results["sketch_build_lineitem"] = round(li_sec, 3)

    turns, t_big = transcript_build_job(spark, CPUS)
    results["sketch_build_transcripts"] = round(t_big, 3)
    tps_big = turns / t_big
    spark.stop()

    scaling = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0":
        small_cores = max(2, CPUS // 4)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-worker", str(small_cores)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        small = json.loads(line)
        eff = (tps_big / small["tps"]) / (CPUS / small_cores)
        scaling = {
            "cores_small": small_cores,
            "cores_big": CPUS,
            "tps_small": small["tps"],
            "tps_big": round(tps_big, 1),
            "efficiency": round(eff, 3),
        }

    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_build_total",
                "value": round(sum(results.values()), 3),
                "unit": "sec",
                "queries": results,
                "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None,
                "throughput": {
                    "lineitem_rows_per_sec": round(n_li / li_sec, 1),
                    "transcript_turns_per_sec": round(tps_big, 1),
                    "transcript_turns": turns,
                },
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--scale-worker":
        _scale_worker(int(sys.argv[2]))
    else:
        main()
