"""Batch sources/sinks: file formats (parquet/CSV/JSON) and the
Kafka-shaped feed.

The reference reads exactly one source (Kafka, `KafakToClickhouse.
scala:42-53`) and writes exactly one sink (ClickHouse JDBC,
`ClickHouseSink.scala`). The engine surface (SURVEY §2.2 "Scans/
sources") adds the file formats an analytics engine needs; streaming
variants live in ``kafkatoclickhouse_spark.streaming``.
"""

from kafkatoclickhouse_spark.sources.files import (  # noqa: F401
    read_table,
    write_table,
)
