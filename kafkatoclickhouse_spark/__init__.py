"""kafkatoclickhouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference Flink pipeline ``1824313754/kafkatoclickhouse`` (Kafka JSON
ingestion → validation → per-key batching → ClickHouse JDBC sink; see
``/root/reference/src/main/scala/KafakToClickhouse.scala:48-63``),
widened to a full relational operator surface plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis), designed for 100 TB scale on a real cluster.

Layout:
    session     SparkSession factory with scale-aware defaults
    config      .properties config loader (reference GetConfig parity)
    tables      test-fixture table loader / view registration
    sources/    Kafka + file sources with metadata projection
    operators/  batch operators: ingest, relational, dedup, similarity,
                text analysis, as-of joins, multimodal
    functions/  reusable column-expression builders (vector math,
                shingling/hashing, text functions)
    streaming/  Structured Streaming: count windows, event-time
                windows, retrying JDBC sink, end-to-end pipeline
    plans/      plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
