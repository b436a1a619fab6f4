"""The reference job, whole: config → topology → start.

Re-expresses ``KafakToClickhouse.main`` (`KafakToClickhouse.scala:
18-63`) as one function chain driven by the same .properties surface
(``config.PipelineConfig`` keeps the reference's key names, so a
reference user's config file ports over unchanged):

    Kafka source (R1)  →  parse/validate/enrich/project (R2–R6)
      →  per-key count window (R5)  →  retrying batched sink (R7)
    with checkpointing (R9) and a dead-letter stream (R3, upgraded
    from the reference's stdout print).

Execution semantics vs the reference (SURVEY §4.3, deliberate):
at-least-once into an idempotent sink (micro-batch replay from the
checkpoint on failure) instead of at-most-once-after-retries; partial
count windows flush on timeout instead of leaking forever.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kafkatoclickhouse_spark.config import PipelineConfig
from kafkatoclickhouse_spark.streaming import (
    count_window,
    count_window_jvm,
    pipeline,
    sink,
    sink_catalog,
    source,
)


def build_topology(
    spark: SparkSession,
    cfg: PipelineConfig,
    raw: DataFrame | None = None,
    finite: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(windowed output stream, dead-letter stream). Pass ``raw`` to
    substitute the Kafka source (tests use the file-backed double;
    the shapes are identical — see ``source.RAW_SCHEMA``).

    ``finite=True`` (availableNow drains) disables the partial-window
    timeout flush — with a processing-time timer pending, Spark keeps
    scheduling no-data micro-batches and the query never terminates
    (see ``count_window.keyed_count_window``); tails stay in
    checkpointed state for the next run."""
    if raw is None:
        raw = source.kafka_raw_stream(
            spark,
            cfg.kafka_bootstrap_servers,
            ",".join(cfg.kafka_topics),
            group_id=cfg.kafka_group_id,
            starting_offsets=cfg.kafka_starting_offsets,
        )
    clean, dirty = pipeline.streaming_ingest(
        raw,
        group_id=cfg.kafka_group_id,
        check_fields=tuple(cfg.check_fields),
    )
    windowed = count_window.keyed_count_window(
        clean,
        key="essCode",
        n=cfg.window_size,
        timeout_ms=None if finite else 60_000,
    )
    return windowed, dirty


def start(
    spark: SparkSession,
    cfg: PipelineConfig,
    write_fn: Callable[[DataFrame], None] | None = None,
    raw: DataFrame | None = None,
    available_now: bool = False,
    catalog: list[tuple[str, str]] | None = None,
    engine: str = "jvm",
) -> StreamingQuery:
    """Wire the topology to the retry sink and start it.

    ``engine`` selects the count-window implementation (VERDICT r10
    #5): ``"jvm"`` (default) runs the foreachBatch JVM-only path —
    measured 2.2× the grouped-UDF throughput, row-identical output,
    timeout parity since r10 (``count_window_jvm``); ``"grouped_udf"``
    keeps the legacy ``applyInPandasWithState`` topology. Both carry
    the 60 s partial-window timeout in infinite mode; on the JVM path
    the timeout also stays armed under ``availableNow`` (flushes
    piggyback on data batches, so finite drains still terminate —
    see ``run_count_window_jvm``).

    ``write_fn`` defaults to the JDBC writer built from the config's
    clickhouse.* keys; any ``(DataFrame) -> None`` substitutes (tests
    pass a parquet writer). ``catalog`` — (name, type) pairs from the
    sink table's catalog (``sink_catalog.fetch_sink_catalog``, the
    reference's open()-time ``system.columns`` read) — shapes the
    output to exactly the sink's columns before writing: extras
    dropped, missing NULLed, values cast, honoring the config's
    string-type list (`MyWindowFunction.scala:71-88`)."""
    if engine not in ("jvm", "grouped_udf"):
        raise ValueError(f"unknown engine {engine!r}")
    if write_fn is None:
        write_fn = sink.jdbc_writer(
            cfg.jdbc_url,
            cfg.jdbc_table,
            user=cfg.jdbc_user or None,
            password=cfg.jdbc_password or None,
        )

    if engine == "grouped_udf":
        windowed, _dirty = build_topology(
            spark, cfg, raw=raw, finite=available_now
        )
        if catalog is not None:
            windowed = sink_catalog.project_to_catalog(
                windowed, catalog, string_types=cfg.string_types
            )
        writer = (
            windowed.writeStream.foreachBatch(
                sink.foreach_batch_writer(
                    write_fn, max_retries=cfg.max_retries
                )
            )
            .option("checkpointLocation", cfg.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    if raw is None:
        raw = source.kafka_raw_stream(
            spark,
            cfg.kafka_bootstrap_servers,
            ",".join(cfg.kafka_topics),
            group_id=cfg.kafka_group_id,
            starting_offsets=cfg.kafka_starting_offsets,
        )
    clean, _dirty = pipeline.streaming_ingest(
        raw,
        group_id=cfg.kafka_group_id,
        check_fields=tuple(cfg.check_fields),
    )

    def sink_write(fired: DataFrame) -> None:
        if catalog is not None:
            fired = sink_catalog.project_to_catalog(
                fired, catalog, string_types=cfg.string_types
            )
        sink.write_with_retry(
            write_fn, fired, max_retries=cfg.max_retries
        )

    # state snapshots live NEXT TO the checkpoint (same durability
    # domain — the module's checkpoint/state-divergence guard assumes
    # they move together)
    state_dir = os.path.join(cfg.checkpoint_dir, "jvm_window_state")
    return count_window_jvm.run_count_window_jvm(
        clean,
        write_fn=sink_write,
        checkpoint_dir=cfg.checkpoint_dir,
        state_dir=state_dir,
        key="essCode",
        n=cfg.window_size,
        available_now=available_now,
        timeout_ms=60_000,
    )
