"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``).

Demonstrates the engine's source-extensibility story: a from-scratch
partition-parallel source the planner treats like any other scan —
here a deterministic synthetic-documents generator (seeded xorshift,
no RNG state shared across partitions), the kind of source a
training-data pipeline uses for load tests and fixture synthesis.

Scale shape: ``partitions()`` returns one ``InputPartition`` per
requested split with its own (start, end) row range, so a
1000-executor cluster generates 1000 ranges concurrently with zero
coordination; each ``read`` yields plain tuples that arrive
Arrow-batched. The reference has nothing comparable (its only source
is the Kafka consumer, `KafakToClickhouse.scala:42-53`).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

WORDS = (
    "spark data table scan join merge filter window batch stream "
    "key value row column vector hash sort group agg query part"
).split()

SCHEMA_DDL = "doc_id BIGINT, text STRING, source STRING"


def _doc(i: int) -> tuple[int, str, str]:
    # xorshift-mixed deterministic words: same doc for the same id in
    # any partitioning of the id range
    x = (i * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
    n = 8 + (x % 25)
    toks = []
    for k in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        toks.append(WORDS[x % len(WORDS)])
    return i, " ".join(toks), f"synth{i % 10}"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "8"))

    def partitions(self) -> list[InputPartition]:
        per = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _doc(i)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)`` after
    ``spark.dataSource.register(SyntheticDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)
