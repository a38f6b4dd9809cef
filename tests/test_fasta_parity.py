"""End-to-end parity with the reference ON ITS OWN INPUTS: parse the
sars-cov-2 FASTA corpus and query.txt exactly as the reference does,
build the corpus k-mer Bloom, probe the query k-mers — query.txt is an
exact prefix of the genome, so the answer is ALL ONES (the reference's
own golden, /root/reference/src/main.cpp:276-281), guaranteed by the
Bloom's zero-false-negative property. Also covers the single-hash
ReferenceBloom parity path and strand-invariant canonicalization."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_multithread_spark.operators.build import (
    SketchSpec,
    build_sketches,
    with_might_contain,
)
from bloomfilter_multithread_spark.sources.fasta import (
    canonical_kmer,
    clean_dna,
    explode_kmers,
    read_fasta,
    revcomp,
)

CORPUS = "/root/reference/inputs/sars-cov-2.fasta"
QUERY = "/root/reference/inputs/query.txt"
K = 31  # any k works: query.txt is an exact prefix of the corpus

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CORPUS) and os.path.exists(QUERY)),
    reason="reference inputs not present",
)


@pytest.fixture(scope="module")
def genome(spark):
    df = read_fasta(spark, CORPUS).cache()
    df.count()
    return df


def test_fasta_parse_matches_reference_fixture(spark, genome):
    rows = genome.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["seq_id"].startswith("NC_045512.2")
    # the published genome length, and the reference's own fixture size
    assert len(r["sequence"]) == 29903
    assert r["sequence"].startswith("ATTAAAGGTTTATACCTTCCCAGGTAACAAACC")
    assert set(r["sequence"]) <= set("ACGTN")


def test_reference_golden_all_ones(spark, genome):
    """The reference's test: every query k-mer must hit the corpus
    Bloom (all-ones output) — query.txt is a prefix of the genome and
    Bloom has zero false negatives."""
    corpus_km = explode_kmers(genome, "sequence", k=K, canonical=False)
    bloom = build_sketches(
        corpus_km, [SketchSpec("b", "bloom", "kmer", {"m_bits": 1 << 20, "k": 5})]
    )["b"]
    query = read_fasta(spark, QUERY)
    q_km = explode_kmers(query, "sequence", k=K, canonical=False)
    probed = with_might_contain(q_km, "kmer", bloom)
    agg = probed.agg(
        F.count("*").alias("n"),
        F.sum(F.col("might_contain").cast("long")).alias("hits"),
    ).first()
    q_len = len(query.first()["sequence"])
    assert agg["n"] == q_len - K + 1  # every position yields a k-mer
    assert agg["hits"] == agg["n"], "golden violated: reference answer is all-ones"


def test_golden_all_ones_with_canonical_kmers(spark, genome):
    """Same golden through the canonical-orientation path (P5 real for
    DNA): canonicalization is applied consistently on both sides, so
    all-ones still holds."""
    corpus_km = explode_kmers(genome, "sequence", k=K, canonical=True)
    bloom = build_sketches(
        corpus_km, [SketchSpec("b", "bloom", "kmer", {"m_bits": 1 << 20, "k": 5})]
    )["b"]
    q_km = explode_kmers(read_fasta(spark, QUERY), "sequence", k=K, canonical=True)
    probed = with_might_contain(q_km, "kmer", bloom)
    agg = probed.agg(F.count("*").alias("n"),
                     F.sum(F.col("might_contain").cast("long")).alias("hits")).first()
    assert agg["hits"] == agg["n"]


def test_canonical_is_strand_invariant(spark, genome):
    """canonical(kmer) == canonical(revcomp(kmer)) for every corpus
    k-mer — the defining property of canonical orientation
    (SkmerExtractor.cpp:82-90)."""
    km = explode_kmers(genome, "sequence", k=15, canonical=False).limit(5000)
    chk = km.select(
        (canonical_kmer("kmer") == canonical_kmer(revcomp("kmer"))).alias("ok")
    )
    assert chk.agg(F.min("ok")).first()[0] is True


def test_clean_dna_filters_reference_classes(spark):
    df = spark.createDataFrame([("acg tNx-YT\n",)], "s string")
    assert df.select(clean_dna("s").alias("c")).first()["c"] == "ACGTNT"


# ----------------------------------------- Python DataSource API route
@pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference fixture absent"
)
def test_fasta_datasource_equals_wholetext_route(spark):
    """spark.read.format('fasta') (Python DataSource API, one
    InputPartition per file) must produce exactly the records of the
    wholetext JVM route on the reference's own corpus."""
    from bloomfilter_multithread_spark.sources.fasta import read_fasta
    from bloomfilter_multithread_spark.sources.fasta_datasource import (
        register_fasta_source,
    )

    register_fasta_source(spark)
    via_ds = spark.read.format("fasta").load(CORPUS)
    via_wt = read_fasta(spark, CORPUS)
    a = sorted((r["seq_id"], r["sequence"]) for r in via_ds.collect())
    b = sorted((r["seq_id"], r["sequence"]) for r in via_wt.collect())
    assert a == b and len(a) >= 1


def test_fasta_datasource_partitions_per_file(spark, tmp_path):
    """Partition planning: one input partition per file (the safe unit
    for order-dependent FASTA assembly), so a many-file corpus reads
    concurrently."""
    from bloomfilter_multithread_spark.sources.fasta_datasource import (
        register_fasta_source,
    )

    for i in range(3):
        (tmp_path / f"s{i}.fa").write_text(f">seq{i} x\nAC\nGT\n>extra{i}\nTTTT\n")
    register_fasta_source(spark)
    df = spark.read.format("fasta").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 3
    rows = {(r["seq_id"], r["sequence"]) for r in df.collect()}
    assert ("seq0 x", "ACGT") in rows and ("extra2", "TTTT") in rows
    assert len(rows) == 6
