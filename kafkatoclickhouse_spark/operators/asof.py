"""As-of joins and range joins ([EXT] — SURVEY.md §2.2 'Joins').

Spark has no native ASOF JOIN; the composition used here is the
union-tag + running-last window trick: union both sides with a tag,
sort per key by (ts, tag) and carry the last seen left-side row
forward with ``F.last(..., ignorenulls=True)``. One shuffle on the
key, one sort — identical cost shape to a sort-merge join, no
``applyInPandas`` needed, scales like any windowed aggregate.
Tag ordering (reference rows before probe rows at equal ts) pins the
inclusive (ts_probe >= ts_ref) semantics of DuckDB ASOF JOIN, which
is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions.exact import micros
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_table


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join. ``backward`` (default): for each probe
    row, the LATEST reference row of the same ``key`` with
    ``reference.ts <= probe.ts``. ``forward``: the EARLIEST reference
    row with ``reference.ts >= probe.ts`` — same union-tag trick with
    the window ordered descending, so the 'last seen' carried value
    is the next-at-or-after row. Both inclusive at equal ts (the
    DuckDB ASOF convention).

    Returns the probe frame plus ``asof_<col>`` for each payload
    column. Probe columns must not collide with reference payloads.
    """
    ref_tagged = reference.select(
        key,
        ts,
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in payload_cols],
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(f"_probe_{c}")
            for c in probe.columns
        ],
    )
    probe_tagged = probe.select(
        key,
        ts,
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(reference.schema[c].dataType).alias(c) for c in payload_cols],
        *[F.col(c).alias(f"_probe_{c}") for c in probe.columns],
    )
    unioned = ref_tagged.unionByName(probe_tagged)
    order_ts = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        W.partitionBy(key)
        .orderBy(order_ts, F.col("_tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_probe_{c}").alias(c) for c in probe.columns],
        *[F.col(f"asof_{c}") for c in payload_cols],
    )


@query(
    "asof_join_events",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id AS view_event_id, user_id, ts, value AS view_value
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.value,
           v.view_event_id AS asof_view_event_id,
           v.view_value AS asof_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent view event (at or
    before it) by the same user — the canonical event-attribution
    as-of join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
    )
    joined = asof_join(
        probe=purchases,
        reference=views,
        key="user_id",
        ts="ts",
        payload_cols=["view_event_id", "view_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "value",
        "asof_view_event_id",
        "asof_view_value",
    )


@query(
    "interval_join_events",
    oracle="""
    SELECT c.event_id AS click_id,
           c.user_id,
           p.event_id AS purchase_id,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (time-bounded) join: every purchase by the same user
    within one hour after a click — the batch twin of a watermarked
    stream-stream join (``streaming/joins.py`` builds the streaming
    form of exactly this plan; Structured Streaming uses the same
    time bound to age out join state).

    The equi-key (user_id) drives a hash shuffle, so the time bound
    is evaluated post-match, not as a nested loop — this scales like
    a plain equi-join. The one-sided fixture filters are pushed to
    the two parquet scans. Built from the same plan definition as
    the streaming form (one definition, two execution modes; the
    watermark is a no-op here on the bounded frame)."""
    from kafkatoclickhouse_spark.streaming import joins as sj

    ev = load_table(spark, sf_dir, "events")
    clicks, purchases = sj.split_clicks_purchases(ev)
    return sj.click_purchase_attribution(clicks, purchases)


@query(
    "range_join_value_bands",
    oracle="""
    SELECT e.event_id, b.band_id
    FROM events e
    JOIN (SELECT CAST(r.range AS BIGINT) AS band_id,
                 r.range * 100.0 AS lo,
                 (r.range + 1) * 100.0 AS hi
          FROM range(10) r) b
      ON e.value >= b.lo AND e.value < b.hi
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (theta) join: events × a small band dimension on a
    BETWEEN condition. Spark plans BroadcastNestedLoopJoin — with a
    10-row broadcast side that is a map-only scan, the right plan at
    any fact-table size."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.range(10).select(
        F.col("id").cast("long").alias("band_id"),
        (F.col("id") * 100.0).alias("lo"),
        ((F.col("id") + 1) * 100.0).alias("hi"),
    )
    return ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
    ).select("event_id", "band_id")


@query(
    "asof_join_forward_events",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id AS view_event_id, user_id, ts, value AS view_value
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.value,
           v.view_event_id AS asof_view_event_id,
           v.view_value AS asof_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
)
def asof_join_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every purchase, the NEXT view event at or
    after it by the same user (what-did-they-do-next attribution) —
    the mirror of ``asof_join_events``, one shuffle + one window."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
    )
    joined = asof_join(
        probe=purchases,
        reference=views,
        key="user_id",
        ts="ts",
        payload_cols=["view_event_id", "view_value"],
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "value",
        "asof_view_event_id", "asof_view_value",
    )


@query(
    "asof_join_nearest_events",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id AS v_id, user_id, ts FROM events
      WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN f.v_id IS NULL THEN b.v_id
                WHEN b.v_id IS NULL THEN f.v_id
                WHEN epoch_us(p.ts) - epoch_us(b.ts)
                     <= epoch_us(f.ts) - epoch_us(p.ts) THEN b.v_id
                ELSE f.v_id END AS nearest_view_id,
           CASE WHEN f.v_id IS NULL AND b.v_id IS NULL THEN NULL
                WHEN f.v_id IS NULL THEN epoch_us(p.ts) - epoch_us(b.ts)
                WHEN b.v_id IS NULL THEN epoch_us(f.ts) - epoch_us(p.ts)
                ELSE least(epoch_us(p.ts) - epoch_us(b.ts),
                           epoch_us(f.ts) - epoch_us(p.ts)) END
             AS nearest_delta_us
    FROM purchases p
    ASOF LEFT JOIN views b ON p.user_id = b.user_id AND p.ts >= b.ts
    ASOF LEFT JOIN views f ON p.user_id = f.user_id AND p.ts <= f.ts
    """,
)
def asof_join_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: the view event closest in time to each purchase
    in EITHER direction (tie → the earlier one, matching the
    backward-preferred convention). Composition of the backward and
    forward as-of passes — two user-keyed window stages; deltas
    compared in exact integer microseconds (memory: cross-engine
    timestamp hashing)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views_b = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("bv_id"),
        F.col("ts").alias("bv_ts"),
        "user_id",
        "ts",
    )
    views_f = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("fv_id"),
        F.col("ts").alias("fv_ts"),
        "user_id",
        "ts",
    )
    r1 = asof_join(
        probe=purchases,
        reference=views_b,
        key="user_id",
        ts="ts",
        payload_cols=["bv_id", "bv_ts"],
        direction="backward",
    )
    r2 = asof_join(
        probe=r1,
        reference=views_f,
        key="user_id",
        ts="ts",
        payload_cols=["fv_id", "fv_ts"],
        direction="forward",
    )
    db = micros("ts") - micros("asof_bv_ts")
    df_ = micros("asof_fv_ts") - micros("ts")
    nearest_id = (
        F.when(F.col("asof_fv_id").isNull(), F.col("asof_bv_id"))
        .when(F.col("asof_bv_id").isNull(), F.col("asof_fv_id"))
        .when(db <= df_, F.col("asof_bv_id"))
        .otherwise(F.col("asof_fv_id"))
    )
    nearest_delta = (
        F.when(
            F.col("asof_fv_id").isNull() & F.col("asof_bv_id").isNull(),
            F.lit(None).cast("long"),
        )
        .when(F.col("asof_fv_id").isNull(), db)
        .when(F.col("asof_bv_id").isNull(), df_)
        .otherwise(F.least(db, df_))
    )
    return r2.select(
        "event_id",
        "user_id",
        nearest_id.alias("nearest_view_id"),
        nearest_delta.alias("nearest_delta_us"),
    )


@query(
    "asof_join_tolerance_events",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT event_id AS view_event_id, user_id, ts AS view_ts
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.value,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.view_ts)
                     <= 7200000000 THEN v.view_event_id END
             AS asof_view_event_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.view_ts)
                     <= 7200000000
                THEN epoch_us(p.ts) - epoch_us(v.view_ts) END
             AS asof_delta_us
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
)
def asof_join_tolerance_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backward as-of join with a TOLERANCE (pandas
    ``merge_asof(tolerance=...)`` semantics): the most recent view at
    or before each purchase counts only if it happened within 2
    hours — staler matches become NULL, because "the user viewed
    this last Tuesday" is not attribution. Same single union-tag
    window pass as :func:`asof_join` (the reference ts rides along
    as a payload column); the tolerance is a post-window map, so the
    plan cost is identical to the untoleranced join. Deltas in exact
    integer microseconds."""
    tol_us = 2 * 3600 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
        "user_id",
        "ts",
    )
    joined = asof_join(
        probe=purchases,
        reference=views,
        key="user_id",
        ts="ts",
        payload_cols=["view_event_id", "view_ts"],
    )
    delta = micros("ts") - micros("asof_view_ts")
    in_tol = delta <= F.lit(tol_us)
    return joined.select(
        "event_id",
        "user_id",
        "value",
        F.when(in_tol, F.col("asof_view_event_id")).alias(
            "asof_view_event_id"
        ),
        F.when(in_tol, delta).alias("asof_delta_us"),
    )
