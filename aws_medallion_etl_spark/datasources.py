"""Custom Python Data Source (Spark 4 DataSource API) — S-extension.

The reference's source surface is files + JDBC; Spark 4 adds a public
API for implementing NEW sources in Python (`pyspark.sql.datasource`),
the sanctioned way to wire a bespoke system (an internal service, a
queue, a generator) into the scan side of the engine. This module
ships one real implementation:

``SyntheticDocsDataSource`` — a partitioned, deterministic document
generator. Every row is a pure function of its ``doc_id``, so the
relation it produces is reproducible on any engine — which is exactly
what lets the DuckDB oracle verify a NON-FILE source end-to-end
(``s20_python_datasource``): the oracle rebuilds the same rows from
``generate_series`` arithmetic.

Scale notes: ``partitions()`` splits the keyspace into
``num_partitions`` independent ranges, so the scan parallelizes like
any file scan; rows stream out of each partition's iterator in
Arrow batches (no driver materialization). A Python data source pays
Python-worker serialization per batch — the documented trade for
custom-source flexibility; bulk analytics stays on parquet/ORC scans.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-text: token i of doc d is ``w<(d*7+i*3)%13>``.

    Chosen to be trivially reproducible in ANSI SQL (modular
    arithmetic only — no hashes, no RNG), while still varying token
    sequences across documents.
    """
    n_tokens = 5 + (doc_id % 7)
    return " ".join(f"w{(doc_id * 7 + i * 3) % 13}" for i in range(n_tokens))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        if self.n_docs <= 0:
            return [_RangePartition(0, 0)]  # empty relation, one no-op split
        step = -(-self.n_docs // self.num_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars bigint"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotently register the custom source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
