"""Property tests for the O(1)-roll polynomial k-mer hash kernel — the
literal re-expression of the reference's per-char ntHash roll
(/root/reference/src/SkmerExtractor.cpp:65-74,104): seed the first
window, then update in O(1) per character instead of rehashing each
k-mer whole.

Three independent computations must agree bit-for-bit:
  1. the vectorized O(n) prefix-sum kernel (production),
  2. the O(n*k) per-position whole-k-mer rehash (what the kernel saves),
  3. the sequential scalar O(1) roll recurrence (the reference's literal
     loop shape).
"""

from __future__ import annotations

import numpy as np
import pytest

from bloomfilter_multithread_spark.sketches.hashing import (
    ROLL_BASE,
    _ROLL_BASE_INV,
    rolling_kmer_hashes,
    rolling_kmer_hashes_naive,
    splitmix64,
)

M64 = (1 << 64) - 1


def _sequential_roll(seq: bytes, k: int) -> np.ndarray:
    """The reference's loop shape in scalar Python ints: seed H(0) by
    direct evaluation, then H(i+1) = (H(i) - s[i]) * B^{-1}
    + s[i+k] * B^{k-1} (mod 2^64) — one O(1) update per character."""
    n = len(seq)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    bkm1 = pow(ROLL_BASE, k - 1, 1 << 64)
    h = 0
    for j in range(k):
        h = (h + seq[j] * pow(ROLL_BASE, j, 1 << 64)) & M64
    out = [h]
    for i in range(n - k):
        h = (((h - seq[i]) & M64) * _ROLL_BASE_INV) & M64
        h = (h + seq[i + k] * bkm1) & M64
        out.append(h)
    raw = np.array(out, dtype=np.uint64)
    return splitmix64(raw)


@pytest.mark.parametrize("k", [1, 2, 5, 31])
@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_equals_naive_and_sequential(k, seed):
    rng = np.random.default_rng(seed)
    seq = bytes(rng.choice(list(b"ACGT"), size=500).tolist())
    fast = rolling_kmer_hashes(seq, k)
    naive = rolling_kmer_hashes_naive(seq, k)
    seq_roll = _sequential_roll(seq, k)
    assert fast.size == len(seq) - k + 1
    assert np.array_equal(fast, naive)
    assert np.array_equal(fast, seq_roll)


def test_position_independence():
    """The same k-mer hashes identically wherever it occurs — the
    build/probe agreement keystone."""
    body = b"ACGTTGCA"
    s1 = b"AAAA" + body + b"CCCC"
    s2 = b"GG" + body
    k = len(body)
    h1 = rolling_kmer_hashes(s1, k)
    h2 = rolling_kmer_hashes(s2, k)
    assert h1[4] == h2[2] == rolling_kmer_hashes(body, k)[0]


def test_edge_cases():
    assert rolling_kmer_hashes(b"", 5).size == 0
    assert rolling_kmer_hashes(b"ACG", 5).size == 0
    assert rolling_kmer_hashes(b"ACGTA", 5).size == 1
    # str input == bytes input
    assert np.array_equal(rolling_kmer_hashes("ACGTACGT", 3),
                          rolling_kmer_hashes(b"ACGTACGT", 3))


def test_distinct_kmers_rarely_collide():
    """Sanity on hash quality after the splitmix64 finalizer: all 4^8
    8-mers hash distinctly (polynomial with odd base is injective on
    windows shorter than 8 bytes packed... checked empirically here)."""
    from itertools import product

    seqs = [bytes(p) for p in product(b"ACGT", repeat=8)]
    hs = np.array([rolling_kmer_hashes(s, 8)[0] for s in seqs], dtype=np.uint64)
    assert np.unique(hs).size == len(seqs)


def test_spark_rolled_golden_zero_fn(spark):
    """End-to-end through the FASTA path: build a Bloom over the corpus'
    rolled k-mer hashes, probe the query's rolled hashes — the query is
    a prefix of the corpus (the reference's own golden fixture), so every
    probe must be TRUE (zero false negatives, main.cpp:276-281 all-ones)."""
    from pyspark.sql import functions as F

    from bloomfilter_multithread_spark.operators.build import (
        SketchSpec,
        build_sketches,
        with_might_contain,
    )
    from bloomfilter_multithread_spark.sources.fasta import rolled_kmer_hashes

    corpus = spark.createDataFrame(
        [("s1", "ACGTACGTTTGACCAGTACCGTA" * 40), ("s2", "TTGCAGGGCATCA" * 55)],
        "seq_id string, sequence string",
    )
    query = corpus.select("seq_id", F.substring("sequence", 1, 200).alias("sequence"))
    k = 31
    built = rolled_kmer_hashes(corpus, k=k)
    bloom = build_sketches(
        built,
        [SketchSpec("b", "bloom", "kmer_hash", {"m_bits": 1 << 17, "k": 5},
                    pre_hashed=True)],
    )["b"]
    probed = with_might_contain(
        rolled_kmer_hashes(query, k=k), F.col("kmer_hash"), bloom, pre_hashed=True
    )
    rows = probed.collect()
    assert len(rows) == 2 * (200 - k + 1)
    assert all(r["might_contain"] for r in rows)
