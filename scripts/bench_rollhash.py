#!/usr/bin/env python
"""Micro-bench: O(n) rolling k-mer hash kernel vs O(n*k) whole-k-mer
rehash (numpy, apples-to-apples on the same polynomial), plus the
end-to-end Spark comparison of the two FASTA k-mer Bloom-build routes
(rolled pre-hashed UDF vs explode_kmers + JVM xxhash64).

Prints one JSON line; numbers are recorded in BENCH.md §roll."""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bloomfilter_multithread_spark.sketches.hashing import (  # noqa: E402
    rolling_kmer_hashes,
    rolling_kmer_hashes_naive,
)


def timed(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    rng = np.random.default_rng(42)
    out = {"numpy": {}, "spark": {}}
    k = 31
    for n in (100_000, 1_000_000):
        seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
        b = seq.tobytes()
        rolling_kmer_hashes(seq, k)  # warm
        rolling_kmer_hashes_naive(b, k)
        t_roll = timed(lambda: rolling_kmer_hashes(seq, k))
        t_naive = timed(lambda: rolling_kmer_hashes_naive(b, k), reps=2)
        out["numpy"][f"n={n}"] = {
            "roll_sec": round(t_roll, 4),
            "whole_kmer_sec": round(t_naive, 4),
            "speedup": round(t_naive / t_roll, 2),
            "roll_mchars_per_sec": round(n / t_roll / 1e6, 1),
        }

    # end-to-end: build a Bloom over all k-mers of 64 x 500k-char
    # sequences, rolled-prehashed vs explode+xxhash64
    from pyspark.sql import functions as F

    from bloomfilter_multithread_spark.operators.build import SketchSpec, build_sketches
    from bloomfilter_multithread_spark.sources.fasta import (
        explode_kmers,
        rolled_kmer_hashes,
    )
    from bloomfilter_multithread_spark.sources.io import get_spark

    spark = get_spark(app="rollbench", master="local[8]", shuffle_partitions=8,
                      driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    # sized so the WHOLE-k-mer baseline terminates in reasonable time:
    # materializing a len(seq)-element array of 31-char strings per row
    # is exactly the allocation storm the rolled kernel avoids (at
    # 32 x 250k chars the baseline build took ~8 min/run vs seconds for
    # the rolled route — run it yourself by raising seq_len)
    n_seqs, seq_len = 32, 50_000
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    rows = [
        (f"s{i}", alphabet[rng.integers(0, 4, size=seq_len)].tobytes().decode("ascii"))
        for i in range(n_seqs)
    ]
    df = spark.createDataFrame(rows, "seq_id string, sequence string").repartition(8)
    df.persist().count()
    params = {"m_bits": 1 << 26, "k": 5}

    def build_rolled():
        build_sketches(rolled_kmer_hashes(df, k=k),
                       [SketchSpec("b", "bloom", "kmer_hash", params, pre_hashed=True)])

    def build_whole():
        build_sketches(explode_kmers(df, k=k, canonical=False),
                       [SketchSpec("b", "bloom", "kmer", params)])

    build_rolled()  # warm (JIT + python workers)
    build_whole()
    t_r = timed(build_rolled, reps=2)
    t_w = timed(build_whole, reps=2)
    total_kmers = n_seqs * (seq_len - k + 1)
    out["spark"] = {
        "n_seqs": n_seqs, "seq_len": seq_len, "k": k, "kmers": total_kmers,
        "rolled_build_sec": round(t_r, 3),
        "explode_xxhash64_build_sec": round(t_w, 3),
        "speedup": round(t_w / t_r, 2),
        "rolled_mkmers_per_sec": round(total_kmers / t_r / 1e6, 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
