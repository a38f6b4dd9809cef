"""FASTA source — the reference's native input format as a DataFrame.

The reference streams FASTA character-by-character on one thread
(/root/reference/src/FastaReader.cpp:25-49: skip '>' header lines,
uppercase, emit A/C/G/T, reset on 'N'). Here a FASTA corpus is a
DataFrame of (file, seq_id, sequence) records:

- ``spark.read.text(..., wholetext=True)`` yields ONE ROW PER FILE —
  the unit of parallelism for genomic corpora, which ship as many
  per-sample/per-contig files. Record assembly then never crosses a
  partition boundary (line-order-dependent parsing of a split text
  file is not reconstructible after a distributed read), and parsing
  is pure JVM codegen: split on '>' record starts, first line =
  header, remaining lines concatenated = sequence.
- the reference's character-class filter (uppercase, non-ACGTN
  dropped) is `clean_dna`.

DNA k-mer functions (the text-shingle analogs, SURVEY.md §2 P2/P5 —
identity for transcripts, REAL for DNA):
- ``dna_kmers(seq, k)``: all k-char substrings (JVM transform/substr).
- ``revcomp``: reverse complement via translate(reverse(s)).
- ``canonical_kmer``: min(kmer, revcomp(kmer)) — strand-invariant
  canonical orientation (SkmerExtractor.cpp:82-90).

tests/test_fasta_parity.py runs the reference's own golden on its own
inputs: query.txt is an exact prefix of the sars-cov-2 genome, so every
query k-mer probes present in the corpus Bloom (the all-ones answer,
/root/reference/src/main.cpp:276-281).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """(file, seq_id, sequence) — one row per FASTA record; parsing is
    whole-file JVM string ops (no Python)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"),
        F.regexp_replace("value", "\r", "").alias("v"),
    )
    rec = raw.select(
        "file",
        F.explode(F.split("v", ">")).alias("rec"),
    ).where(F.length(F.trim("rec")) > 0)
    parts = F.split(F.col("rec"), "\n", 2)
    header = F.trim(parts.getItem(0))
    seq_lines = F.when(F.size(parts) > 1, parts.getItem(1)).otherwise(F.lit(""))
    return rec.select(
        "file",
        header.alias("seq_id"),
        F.upper(F.regexp_replace(seq_lines, r"\s", "")).alias("sequence"),
    ).where(F.length("sequence") > 0)


def clean_dna(col: Column | str) -> Column:
    """The reference's character-class filter (FastaReader.cpp:33-47):
    uppercase, keep only A/C/G/T/N."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.upper(c), "[^ACGTN]", "")


def dna_kmers(col: Column | str, k: int) -> Column:
    """array<string> of all k-char substrings (JVM substr transform —
    the character-window analog of token shingles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(0))),
        lambda i: c.substr(i, F.lit(k)),
    )


def revcomp(col: Column | str) -> Column:
    """Reverse complement (SkmerExtractor.cpp:82-90): reverse the string
    and map A<->T, C<->G (N fixed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.reverse(c), "ACGT", "TGCA")


def canonical_kmer(col: Column | str) -> Column:
    """Canonical orientation = lexicographic min of (kmer, revcomp) —
    strand-invariant by construction."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(c, revcomp(c))


def explode_kmers(df: DataFrame, seq_col: str = "sequence", k: int = 31,
                  canonical: bool = True, out_col: str = "kmer") -> DataFrame:
    """df -> one row per k-mer (optionally canonicalized), ready for
    SketchSpec(..., 'bloom', 'kmer') builds."""
    km = F.explode(dna_kmers(seq_col, k)).alias(out_col)
    out = df.select("*", km)
    if canonical:
        out = out.withColumn(out_col, canonical_kmer(out_col))
    return out


def rolled_kmer_hashes(df: DataFrame, seq_col: str = "sequence", k: int = 31,
                       out_col: str = "kmer_hash", with_pos: bool = False,
                       pos_col: str = "kmer_pos") -> DataFrame:
    """Pre-hashed k-mer producer via the O(1)-roll polynomial kernel —
    the literal form of the reference's per-char ntHash roll
    (/root/reference/src/SkmerExtractor.cpp:65-74,104), replacing the
    whole-k-mer rehash route (explode_kmers + JVM xxhash64, O(k) per
    position) with O(n) total per sequence.

    One row per k-mer with ``out_col: long`` carrying the 64-bit hash,
    ready for ``SketchSpec(..., pre_hashed=True)`` builds. The pandas UDF
    loops over SEQUENCE rows (few, long — one genome/contig each, the
    wholetext read unit) while the per-position work inside each row is
    fully vectorized numpy; this is the sanctioned Arrow-batch shape, not
    per-k-mer Python. Build and probe run the identical kernel, so the
    same k-mer hashes to the same value on both sides (the reference's
    correctness keystone)."""
    import pandas as pd

    from bloomfilter_multithread_spark.sketches.hashing import rolling_kmer_hashes

    @F.pandas_udf("array<long>")
    def roll(seqs):
        return pd.Series(
            [rolling_kmer_hashes(s or "", k).astype(np.int64) for s in seqs],
            dtype=object,
        )

    if with_pos:
        # 0-based window start alongside each hash (posexplode) — lets
        # callers re-derive the k-mer STRING via substring(seq, pos+1, k)
        # for exact-confirm joins
        return df.select("*", F.posexplode(roll(F.col(seq_col))).alias(pos_col, out_col))
    return df.select("*", F.explode(roll(F.col(seq_col))).alias(out_col))
