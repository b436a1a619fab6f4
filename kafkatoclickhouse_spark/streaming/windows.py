"""Event-time windows, watermarks, streaming dedup (SURVEY §2.2 [EXT]).

The reference is purely processing-time — records carry an event time
(``cTime``) that its windows ignore (SURVEY §2.2 "Streaming:
watermark/event-time": absent). These are the engine-new event-time
operators, built entirely from Structured Streaming built-ins.

Each builder takes any DataFrame (bounded or unbounded) — in batch
mode the watermark is a no-op and the same plan is oracle-checkable
(`operators.event_windows` registers the batch twins); in streaming
mode the watermark bounds state and drops late data.

Scale: windowed aggregations shuffle once on (key, window); Spark
compiles ``F.window`` to a window-start expression, so the state key
space is keys × open-windows — bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(
    df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Late-data bound; no-op on batch DataFrames."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    aggs: tuple[Column, ...] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Non-overlapping fixed windows: one row per (window, keys)."""
    return (
        with_watermark(df, ts_col, watermark)
        .groupBy(F.window(ts_col, size), *keys)
        .agg(F.count("*").alias("n_events"), *aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in size/slide windows."""
    return (
        with_watermark(df, ts_col, watermark)
        .groupBy(F.window(ts_col, size, slide), *keys)
        .agg(F.count("*").alias("n_events"))
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: per key, events < gap apart merge; the window
    closes gap after the last event (Spark's session_window end =
    last event + gap)."""
    return (
        with_watermark(df, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(F.count("*").alias("n_events"))
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def streaming_dedup(
    df: DataFrame,
    id_cols: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-id pass-through: state holds ids only within
    the watermark horizon (``dropDuplicatesWithinWatermark`` on
    streams; plain dropDuplicates on batch — same visible result)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(id_cols)
        )
    return df.dropDuplicates(list(id_cols))
