"""Reference-parity JSON ingestion pipeline, batch form.

Re-expresses the reference dataflow (R2–R6 in SURVEY.md §2.1) as one
declarative DataFrame chain:

    raw JSON string
      → parse once (``from_json``)             [ref parses 3×:
        MyKafkaDeserializationSchema.scala:23, KafakToClickhouse.scala:59,
        MyWindowFunction.scala:39 — we parse exactly once into columns]
      → Kafka-metadata projection              [MyKafkaDeserializationSchema.scala:17-27]
      → required-field validation + dead-letter [MyKafkaDeserializationSchema.scala:47-60;
        dirty data went to stdout in the reference — we return it as a
        DataFrame for a dead-letter sink]
      → derivations dayOfYear / sTime          [MyWindowFunction.scala:40-42]
      → projection onto the sink schema        [MyWindowFunction.scala:44-47]

Scale notes: every step is a narrow transformation — no shuffle at
all until a keyed operator downstream asks for one; the validation
predicate is a Catalyst filter that pushes into the scan when the
source is columnar. The reference's per-record triple JSON parse is
the kind of cost that dominates at 100 TB; parsing once into columns
is the single biggest win of the Spark re-expression.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Payload contract per FIXTURES.md §B / reference test.properties:27.
REQUIRED_FIELDS = ("cTime", "essCode")

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("essCode", T.StringType()),
        T.StructField("cTime", T.StringType()),
        T.StructField("power", T.StringType()),
        T.StructField("soc", T.StringType()),
    ]
)


def events_as_raw_json(events: DataFrame, num_partitions: int = 8) -> DataFrame:
    """Derive the reference-shaped Kafka feed from the ``events``
    fixture (FIXTURES.md §B): a `value` JSON string plus Kafka-like
    metadata columns, deterministic from seed=42 data.

    The fan_out models the source's real layout: a Kafka topic is
    consumed partition-parallel (the reference subscribes multi-topic
    across 3 brokers, `test.properties:2-3`), so the JSON
    serialize/parse work downstream must not serialize onto the
    single split the local parquet fixture arrives as.
    """
    from kafkatoclickhouse_spark.tables import fan_out

    events = fan_out(events)
    return events.select(
        F.to_json(
            F.struct(
                F.col("user_id").cast("string").alias("essCode"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("cTime"),
                F.col("value").cast("string").alias("power"),
                F.get_json_object("props", "$.k").alias("soc"),
            )
        ).alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % num_partitions).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
    )


def parse_and_enrich(
    raw: DataFrame, group_id: str = "spark-graft"
) -> DataFrame:
    """R2: bytes/string → columns + Kafka metadata injection.

    The reference mutates the JSON payload to carry metadata
    (``MyKafkaDeserializationSchema.scala:24-27``); columns are the
    Spark-native equivalent — same information, zero re-serialization.
    """
    # Parse-once barrier: PushDownPredicates inlines project aliases
    # into pushed filters, so the downstream validation predicates
    # would each re-evaluate the from_json roundtrip below this
    # projection (the reference's triple-parse recreated by the
    # optimizer — visible as from_json inside the pre-Exchange Filter
    # in .explain). Predicate pushdown through a Project is blocked
    # only when the projection carries a NON-DETERMINISTIC field, so
    # the parse projection pins a spark_partition_id nonce (flagged
    # non-deterministic, costs one int read, and — unlike
    # monotonically_increasing_id — allowed in streaming plans), and
    # the barrier filter keeps it from being column-pruned away.
    # Later filters combine with the barrier and stop here: from_json
    # evaluates exactly once, validation reads struct fields.
    parsed = raw.select(
        F.from_json("value", PAYLOAD_SCHEMA).alias("j"),
        F.col("topic").alias("topicName"),
        F.col("offset").alias("topicOffset"),
        F.col("partition").alias("topicPartition"),
        F.lit(group_id).alias("topicGroupId"),
        F.spark_partition_id().alias("_parse_nonce"),
    ).filter(F.col("_parse_nonce") >= 0)
    return parsed.select(
        "j.*", "topicName", "topicOffset", "topicPartition", "topicGroupId"
    )


def validation_predicate(
    fields: tuple[str, ...] = REQUIRED_FIELDS,
) -> Column:
    """R3 predicate: every required field present and non-empty.

    Mirrors ``checkAndProcess`` (`MyKafkaDeserializationSchema.scala:
    47-60`): a record missing any of ``check.field`` is dirty. The
    reference also treats empty string as null at insert time
    (``MyWindowFunction.scala:86-88``); we apply that at validation.
    """
    conds = [
        F.col(f).isNotNull() & (F.col(f) != F.lit("")) for f in fields
    ]
    return reduce(lambda a, b: a & b, conds)


def split_clean_dirty(
    df: DataFrame, fields: tuple[str, ...] = REQUIRED_FIELDS
) -> tuple[DataFrame, DataFrame]:
    """Clean stream + dead-letter stream (reference printed dirty
    records to stdout, `MyKafkaDeserializationSchema.scala:54`; a
    dead-letter DataFrame is the scalable equivalent)."""
    pred = validation_predicate(fields)
    return df.filter(pred), df.filter(~pred)


def observed_clean(
    df: DataFrame,
    fields: tuple[str, ...] = REQUIRED_FIELDS,
    observation: object | None = None,
) -> DataFrame:
    """The clean stream with validation metrics attached via
    ``df.observe``: total/dirty counts accumulate as a side effect of
    whatever action runs the frame — ONE pass over the data, no
    second counting job (at 100 TB a separate ``dirty.count()`` job
    re-reads the source). Pass a ``pyspark.sql.Observation`` for
    batch (read ``observation.get`` after an action) or a string
    name for streaming (metrics arrive in each progress event's
    ``observedMetrics``). The reference's only "metric" is a println
    per dirty record (`MyKafkaDeserializationSchema.scala:54`)."""
    pred = validation_predicate(fields)
    observed = df.observe(
        observation if observation is not None else "ingest_validation",
        F.count(F.lit(1)).alias("n_total"),
        F.sum((~pred).cast("long")).alias("n_dirty"),
    )
    return observed.filter(pred)


def enrich(df: DataFrame) -> DataFrame:
    """R6 derivations (`MyWindowFunction.scala:40-42`):
    ``dayOfYear`` = first 10 chars of cTime (the date part — the
    reference's name is a misnomer we keep for parity), ``sTime`` =
    processing-time wall clock.
    """
    return df.withColumn(
        "dayOfYear", F.substring("cTime", 1, 10)
    ).withColumn("sTime", F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss"))


def project_to_sink(df: DataFrame, sink_columns: list[str]) -> DataFrame:
    """R6 projection (`MyWindowFunction.scala:44-47`): keep sink-table
    columns; fields absent from the frame become NULL (the reference
    emits SQL ``null`` for JSON fields missing from a record,
    `MyWindowFunction.scala:85-88`). Sink-side typing is applied by
    the JDBC writer; the quoting/escaping machinery of
    `MyWindowFunction.scala:89-95` disappears entirely under
    parameterized batch writes.
    """
    cols = [
        F.col(c) if c in df.columns else F.lit(None).alias(c)
        for c in sink_columns
    ]
    return df.select(*cols)


SINK_COLUMNS = [
    "essCode",
    "cTime",
    "dayOfYear",
    "power",
    "soc",
    "topicName",
    "topicOffset",
    "topicPartition",
    "topicGroupId",
]


def ingest_pipeline(events: DataFrame, with_stime: bool = False) -> DataFrame:
    """Full R2→R6 chain over the events fixture, typed output.

    ``sTime`` is processing-time (nondeterministic) so it is excluded
    unless asked for — the oracle contract hashes only deterministic
    columns (FIXTURES.md).
    """
    raw = events_as_raw_json(events)
    parsed = parse_and_enrich(raw)
    clean, _dirty = split_clean_dirty(parsed)
    enriched = enrich(clean)
    out = project_to_sink(
        enriched, SINK_COLUMNS + (["sTime"] if with_stime else [])
    )
    # typed projection for downstream analytics / oracle comparison:
    # payload strings → engine types (sink-side typing made explicit).
    return out.withColumn("power", F.col("power").cast("double")).withColumn(
        "soc", F.col("soc").cast("long")
    )
