"""FASTA as a REGISTERED Spark data source (Python DataSource API,
Spark 4): ``spark.dataSource.register(FastaDataSource)`` then
``spark.read.format("fasta").load(path)``.

This is the engine-integrated form of ``sources/fasta.py::read_fasta``
(same output schema and identical record semantics — asserted equal in
tests/test_fasta_parity.py): the format shows up in the catalog like
any built-in, options flow through the reader API, and partition
planning is explicit — one InputPartition per FASTA file, the same
unit of parallelism the wholetext route uses, because FASTA record
assembly is line-order-dependent and must never cross a split
boundary. At corpus scale (many per-sample files) the cluster reads
files concurrently; a single giant multi-record file is the one shape
this source serializes, documented here rather than silently split
wrong.

The reference's single-threaded reader is
/root/reference/src/FastaReader.cpp:25-49; parsing here matches
read_fasta: records split on '>', header = first line, sequence =
remaining lines uppercased with all whitespace removed.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            f for f in glob.glob(os.path.join(path, "*")) if os.path.isfile(f)
        )
    return sorted(glob.glob(path)) or [path]


def _parse_fasta(path: str):
    with open(path, encoding="utf-8", errors="replace") as fh:
        text = fh.read().replace("\r", "")
    for rec in text.split(">"):
        if not rec.strip():
            continue
        first, _, rest = rec.partition("\n")
        seq = "".join(rest.split()).upper()
        if seq:
            yield (path, first.strip(), seq)


class FastaPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastaReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fasta source requires a path")

    def partitions(self):
        return [FastaPartition(f) for f in _expand(self.path)]

    def read(self, partition: FastaPartition):
        yield from _parse_fasta(partition.path)


class FastaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return "file string, seq_id string, sequence string"

    def reader(self, schema) -> FastaReader:
        return FastaReader(self.options)


def register_fasta_source(spark) -> None:
    """Idempotent registration: after this, ``spark.read.format("fasta")``
    works session-wide."""
    spark.dataSource.register(FastaDataSource)
