"""Streaming ingest chain (R2–R6): the batch transforms, unbounded.

Every step in ``operators.ingest`` is a narrow, stateless
transformation, so the streaming pipeline IS the batch pipeline —
``parse_and_enrich``/``split_clean_dirty``/``enrich``/
``project_to_sink`` applied to a streaming DataFrame unchanged. This
is the central design dividend of the Spark re-expression: the
reference maintains one hand-built streaming topology
(`KafakToClickhouse.scala:48-63`); we maintain one declarative plan
that Catalyst runs bounded or unbounded.

Scale: all steps here are per-row (no shuffle); at 100 TB/day the
only exchanges in the job come from downstream keyed operators
(count_window, windowed aggs), never from ingest itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafkatoclickhouse_spark.operators import ingest


def streaming_ingest(
    raw: DataFrame,
    group_id: str = "spark-graft",
    with_stime: bool = False,
    check_fields: tuple[str, ...] = ingest.REQUIRED_FIELDS,
) -> tuple[DataFrame, DataFrame]:
    """raw (Kafka-shaped) stream → (clean enriched stream, dead-letter
    stream). Mirrors the reference chain deserialize→filter→enrich→
    project (`KafakToClickhouse.scala:53-58`,
    `MyWindowFunction.scala:40-47`); dirty records become a DataFrame
    for a dead-letter sink instead of stdout
    (`MyKafkaDeserializationSchema.scala:54`, SURVEY §4.3).
    ``check_fields`` ≈ the reference's ``check.field`` property."""
    parsed = ingest.parse_and_enrich(raw, group_id=group_id)
    clean, dirty = ingest.split_clean_dirty(parsed, tuple(check_fields))
    enriched = ingest.enrich(clean)
    out = ingest.project_to_sink(
        enriched,
        ingest.SINK_COLUMNS + (["sTime"] if with_stime else []),
    )
    return out, dirty
