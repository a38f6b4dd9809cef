#!/usr/bin/env python
"""Regenerate the pinned BPE merge table in operators/tokenizer.py.

Trains train_bpe(n_merges=40, min_count=10) on the sf0.01 documents
fixture and rewrites the PINNED_BASE / PINNED_MERGES constants in place.
Deterministic: same fixture -> same table."""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bloomfilter_multithread_spark.sources.io import get_spark  # noqa: E402


def main() -> None:
    from bloomfilter_multithread_spark.operators.tokenizer import train_bpe

    spark = get_spark(app="train-pinned-bpe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base, merges = train_bpe(docs, "text", n_merges=40, min_count=10)
    spark.stop()

    path = os.path.join(os.path.dirname(__file__), "..",
                        "bloomfilter_multithread_spark", "operators", "tokenizer.py")
    src = open(path).read()
    src = re.sub(r"PINNED_BASE: list\[str\] = .*",
                 f"PINNED_BASE: list[str] = {base!r}", src)
    src = re.sub(r"PINNED_MERGES: list\[tuple\[str, str\]\] = .*",
                 f"PINNED_MERGES: list[tuple[str, str]] = {merges!r}", src)
    open(path, "w").write(src)
    print(f"base={len(base)} chars, merges={len(merges)}")


if __name__ == "__main__":
    main()
