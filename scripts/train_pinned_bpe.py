#!/usr/bin/env python
"""Regenerate the pinned BPE merge tables in operators/tokenizer.py.

Two tables, both trained deterministically (same fixture -> same table):

- PINNED_BASE / PINNED_MERGES: the original 40-merge demo table,
  train_bpe(n_merges=40, min_count=10) on the sf0.01 documents fixture.
- PINNED_BASE_1K / PINNED_MERGES_1K (round 5, VERDICT r4 #3): a
  vocabulary-scale table, train_bpe(n_merges=1024, min_count=1) on the
  sf0.01 TOKENIZER TRAINING UNION — documents.text + customer.c_name +
  events.props, the same corpus the token_count_real contract query
  tokenizes (documents alone has only 31 distinct words, which cannot
  support 1k merges; the union has ~1.6k distinct words and yields the
  full 1024). Training cost is driver-side and bounded by the
  distinct-word table: measured 2.4 s for 1,024 merges over 1,632
  words on this box (the corpus-wide work is ONE explode+groupBy).

Also asserts the replace-chain oracle's sentinel (\\x1f) never occurs
in the corpus vocabulary — the one precondition of the
duckdb_bpe_words_replace_sql mirror.
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bloomfilter_multithread_spark.sources.io import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import functions as F

    from bloomfilter_multithread_spark.operators.tokenizer import (
        _SENTINEL,
        train_bpe,
    )

    spark = get_spark(app="train-pinned-bpe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base, merges = train_bpe(docs, "text", n_merges=40, min_count=10)

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    union = (
        docs.select(F.col("text"))
        .unionByName(cust.select(F.col("c_name").alias("text")))
        .unionByName(ev.select(F.col("props").alias("text")))
    )
    assert union.where(F.col("text").contains(_SENTINEL)).count() == 0, (
        "corpus contains the \\x1f sentinel — the replace-chain oracle "
        "needs a different delimiter"
    )
    t0 = time.time()
    base_1k, merges_1k = train_bpe(union, "text", n_merges=1024, min_count=1)
    dt = time.time() - t0
    spark.stop()
    if len(merges_1k) < 1024:
        raise SystemExit(f"only {len(merges_1k)} merges trainable — corpus too small")

    path = os.path.join(os.path.dirname(__file__), "..",
                        "bloomfilter_multithread_spark", "operators", "tokenizer.py")
    src = open(path).read()
    src = re.sub(r"PINNED_BASE: list\[str\] = .*",
                 f"PINNED_BASE: list[str] = {base!r}", src)
    src = re.sub(r"PINNED_MERGES: list\[tuple\[str, str\]\] = .*",
                 f"PINNED_MERGES: list[tuple[str, str]] = {merges!r}", src)
    src = re.sub(r"PINNED_BASE_1K: list\[str\] = .*",
                 f"PINNED_BASE_1K: list[str] = {base_1k!r}", src)
    src = re.sub(r"PINNED_MERGES_1K: list\[tuple\[str, str\]\] = .*",
                 f"PINNED_MERGES_1K: list[tuple[str, str]] = {merges_1k!r}", src)
    open(path, "w").write(src)
    print(f"40-merge: base={len(base)}; 1k: base={len(base_1k)} "
          f"merges={len(merges_1k)} trained in {dt:.1f} s")


if __name__ == "__main__":
    main()
