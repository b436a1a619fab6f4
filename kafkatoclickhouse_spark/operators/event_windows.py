"""Event-time window queries — batch twins of ``streaming.windows``.

The reference has no event-time semantics (SURVEY §2.2: its only
window is a processing-time count trigger, `KafakToClickhouse.scala:
57-61`), so these are engine-new [EXT] operators. Each builder calls
the SAME ``streaming.windows`` functions that run unbounded under
Structured Streaming — batch mode makes them oracle-checkable, which
is exactly the test strategy SURVEY §5 prescribes (streaming paths
unit-tested batch-first).

Window starts are epoch-aligned in both engines (Spark ``F.window``
and the oracle's explicit epoch arithmetic), so results match bit-for-
bit; timestamps are emitted as formatted strings to keep the value
hash engine-neutral.

Scale: one shuffle on (window, key); watermarking (streaming form)
bounds state to the late-data horizon. Sliding windows multiply rows
by size/slide — here 2× — which is the expected cost model, not a
plan accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions.exact import dsum, micros, sql_dsum
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.streaming import windows as sw
from kafkatoclickhouse_spark.tables import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_DFMT = "%Y-%m-%d %H:%M:%S"


@query(
    "stream_window_tumbling",
    oracle=f"""
    WITH b AS (
      SELECT event_type, value,
             TIMESTAMP '1970-01-01'
               + INTERVAL 1 SECOND * (CAST(floor(epoch(ts)/3600) AS BIGINT)*3600)
               AS ws
      FROM events
    )
    SELECT strftime(ws, '{_DFMT}') AS window_start,
           strftime(ws + INTERVAL 1 HOUR, '{_DFMT}') AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM b GROUP BY ws, event_type
    """,
)
def stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type over events.ts."""
    df = load_table(spark, sf_dir, "events")
    out = sw.tumbling_counts(
        df, "ts", "1 hour", keys=("event_type",),
        aggs=(dsum("value", "total_value"),),
    )
    return out.select(
        F.date_format("window_start", _FMT).alias("window_start"),
        F.date_format("window_end", _FMT).alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "stream_window_sliding",
    oracle=f"""
    WITH g AS (
      SELECT value, CAST(floor(epoch(ts)/1800) AS BIGINT)*1800 AS b
      FROM events
    ), w AS (
      SELECT b AS s, value FROM g
      UNION ALL
      SELECT b - 1800 AS s, value FROM g
    )
    SELECT strftime(TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * s,
                    '{_DFMT}') AS window_start,
           strftime(TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (s + 3600),
                    '{_DFMT}') AS window_end,
           COUNT(*) AS n_events
    FROM w GROUP BY s
    """,
)
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event in 2 windows.
    The oracle materializes the same two window starts per event via
    explicit epoch arithmetic (UNION ALL of the two 30-min grids)."""
    df = load_table(spark, sf_dir, "events")
    out = sw.sliding_counts(df, "ts", "1 hour", "30 minutes")
    return out.select(
        F.date_format("window_start", _FMT).alias("window_start"),
        F.date_format("window_end", _FMT).alias("window_end"),
        "n_events",
    )


@query(
    "stream_window_session",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 10 MINUTE
                  THEN 0 ELSE 1 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           strftime(MIN(ts), '{_DFMT}') AS session_start,
           strftime(MAX(ts) + INTERVAL 10 MINUTE, '{_DFMT}') AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap session windows per user_id. Spark merges an
    event into a session iff ts − last < gap (strict; window end is
    exclusive), matched by the oracle's gaps-and-islands form."""
    df = load_table(spark, sf_dir, "events")
    out = sw.session_counts(df, "ts", "10 minutes", keys=("user_id",))
    return out.select(
        "user_id",
        F.date_format("session_start", _FMT).alias("session_start"),
        F.date_format("session_end", _FMT).alias("session_end"),
        "n_events",
    )


@query(
    "rollup_time_hierarchy",
    oracle=f"""
    SELECT 'minute' AS grain,
           strftime(date_trunc('minute', ts), '{_DFMT}') AS bucket,
           COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
    FROM events GROUP BY date_trunc('minute', ts)
    UNION ALL
    SELECT 'hour', strftime(date_trunc('hour', ts), '{_DFMT}'),
           COUNT(*), {sql_dsum('value')}
    FROM events GROUP BY date_trunc('hour', ts)
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', ts), '{_DFMT}'),
           COUNT(*), {sql_dsum('value')}
    FROM events GROUP BY date_trunc('day', ts)
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: minute, hour,
    and day grains in one result, where each coarser grain is
    RE-AGGREGATED FROM THE FINER GRAIN'S PARTIALS — the fact table
    is scanned exactly once. The oracle computes every grain from
    raw events, so the hash match proves re-aggregation loses
    nothing: counts sum, and the decimal partial sums stay decimal
    between levels (only the output casts to double).

    At 100 TB this is the only viable shape for dashboard
    hierarchies: the minute aggregate is ~10⁴× smaller than raw
    events, so hour/day derive from megabytes instead of re-reading
    terabytes. In a hot/cold design the minute grain is the stored
    continuous aggregate (foreachBatch-updated); this operator is
    its batch/backfill twin."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket_ts")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(24,4)")).alias("dv"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket_ts").alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("dv").cast("decimal(24,4)").alias("dv"),
    )
    day = hour.groupBy(
        F.date_trunc("day", "bucket_ts").alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("dv").cast("decimal(24,4)").alias("dv"),
    )

    def finish(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format("bucket_ts", _FMT).alias("bucket"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("dv").cast("double").alias("total_value"),
        )

    return (
        finish(minute, "minute")
        .unionAll(finish(hour, "hour"))
        .unionAll(finish(day, "day"))
    )


@query(
    "timeseries_gapfill_ffill",
    oracle=f"""
    WITH src AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value
      FROM events WHERE user_id % 50 = 0
    ),
    hourly AS (
      SELECT user_id, bucket,
             {sql_dsum('value')} AS v_sum,
             COUNT(*) AS n_events
      FROM src GROUP BY user_id, bucket
    ),
    bounds AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM src GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    )
    SELECT g.user_id,
           strftime(g.bucket, '{_DFMT}') AS bucket,
           COALESCE(h.n_events, 0) AS n_events,
           h.v_sum AS v_sum,
           last_value(h.v_sum IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_ffill
    FROM grid g
    LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with forward fill — the hypertable
    ``time_bucket_gapfill`` + ``locf`` pattern: per entity, a dense
    hourly grid spanning its observed range (sequence + explode —
    generated, not stored), left-joined against the actual hourly
    aggregates, silent hours carried forward from the last observed
    value (``last`` with ignorenulls over an ordered per-key window).

    Scale shape: the grid is rows × (span/grain) and is generated
    partition-local from one (min, max) row per key — no shuffle to
    build it; the join and the fill window both key on user_id, so
    AQE reuses one exchange. The dense output is what downstream
    models (anomaly detection, feature windows) consume without
    null-handling logic."""
    from pyspark.sql import Window as W

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("bucket"),
            "value",
        )
    )
    hourly = ev.groupBy("user_id", "bucket").agg(
        dsum("value", "v_sum"), F.count("*").alias("n_events")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.join(hourly, ["user_id", "bucket"], "left").select(
        "user_id",
        F.date_format("bucket", _FMT).alias("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "v_sum",
        F.last("v_sum", ignorenulls=True).over(w).alias("v_ffill"),
    )


@query(
    "sessionize_events",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                    > 30 * 60 * 1000000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(ts), '{_DFMT}') AS session_start,
           strftime(MAX(ts), '{_DFMT}') AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a session starts wherever the
    per-user gap to the previous event exceeds 30 minutes; the
    running sum of start markers numbers the sessions. The batch
    (windowed) formulation of what ``F.session_window`` computes in
    streaming — kept as its own operator because the lag/cumsum
    pattern composes with arbitrary boundary predicates (value
    resets, type changes), not just time gaps.

    One exchange on user_id serves the lag, the cumsum, and the
    final per-session aggregate — Catalyst reuses the sort order
    across all three windows."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds on both sides — a seconds cast would
    # truncate and disagree with the oracle on boundary-width gaps.
    us = micros("ts")
    gap = us - F.lag(us).over(w_ord)
    marked = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    numbered = marked.withColumn(
        "session_seq", F.sum("is_start").over(w_run)
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
        F.date_format(F.max("ts"), _FMT).alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value", "total_value"),
    )


# ---------------------------------------------------------------------------
# Funnel & retention (event-log analytics over the events table)
# ---------------------------------------------------------------------------


@query(
    "events_funnel_steps",
    oracle="""
    WITH w1 AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS tv
      FROM events
    ),
    w2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > tv
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS tc
      FROM w1
    ),
    w3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > tc
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS tp
      FROM w2
    )
    SELECT user_id,
           epoch_us(MAX(tv)) AS view_us,
           epoch_us(MAX(tc)) AS click_us,
           epoch_us(MAX(tp)) AS purchase_us,
           CAST(CASE WHEN MAX(tp) IS NOT NULL THEN 3
                     WHEN MAX(tc) IS NOT NULL THEN 2
                     WHEN MAX(tv) IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS steps_completed
    FROM w3 GROUP BY user_id
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase) per user: first view,
    first click strictly after it, first purchase strictly after
    that — the sequential-conversion query every event warehouse
    runs.

    Shape: three chained window-mins over ONE hash partitioning on
    user_id (the later mins depend on the earlier, but the
    partitioning is identical so Catalyst plans a single Exchange,
    then Window operators back-to-back, then the final groupBy reuses
    the same partitioning — one shuffle total at any scale).
    Timestamps emitted as integer microseconds (memory: cross-engine
    timestamp hashing)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    byu = W.partitionBy("user_id")
    tv = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(byu)
    step1 = ev.select("user_id", "event_type", "ts", tv.alias("tv"))
    tc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("tv")),
            F.col("ts"),
        )
    ).over(byu)
    step2 = step1.withColumn("tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("tc")),
            F.col("ts"),
        )
    ).over(byu)
    step3 = step2.withColumn("tp", tp)
    steps = (
        F.when(F.max("tp").isNotNull(), 3)
        .when(F.max("tc").isNotNull(), 2)
        .when(F.max("tv").isNotNull(), 1)
        .otherwise(0)
    )
    return step3.groupBy("user_id").agg(
        micros(F.max("tv")).alias("view_us"),
        micros(F.max("tc")).alias("click_us"),
        micros(F.max("tp")).alias("purchase_us"),
        steps.cast("int").alias("steps_completed"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firstday AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_date,
             date_diff('day', f.cohort_date, CAST(e.ts AS DATE))
               AS day_offset
      FROM events e JOIN firstday f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_date,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_date, day_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen date,
    counted on each subsequent day-offset they were active.

    Shape: first-day agg (one user-keyed exchange), join back on
    user_id (same partitioning — no second fact shuffle), distinct +
    count on the small (cohort, offset) key space. The join is
    user-keyed, so at 100 TB it co-partitions with the aggregation
    instead of broadcasting the (potentially huge) user dimension."""
    ev = load_table(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = (
        ev.join(firstday, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
        F.col("day_offset").cast("long").alias("day_offset"),
    ).agg(F.count("*").alias("n_active_users"))


@query(
    "events_trending_topk",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             TIMESTAMP '1970-01-01'
               + INTERVAL 1 SECOND
                 * (CAST(floor(epoch(ts)/3600) AS BIGINT)*3600) AS ws
      FROM events
    ),
    c AS (SELECT ws, event_type, COUNT(*) AS n_events
          FROM b GROUP BY ws, event_type)
    SELECT strftime(ws, '{_DFMT}') AS window_start, event_type,
           n_events, CAST(rnk AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY ws ORDER BY n_events DESC, event_type) AS rnk
          FROM c)
    WHERE rnk <= 3
    """,
)
def events_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 trending event types per hour — the 'what is hot right
    now' dashboard query: tumbling-window counts ranked within each
    window (count desc, type asc tiebreak). Composes the two shapes
    the engine already pins separately: map-side-combinable window
    counts and a per-partition top-k window whose input is already
    one row per (window, type) — never the raw events."""
    from pyspark.sql import Window as W

    df = load_table(spark, sf_dir, "events")
    agg = df.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = W.partitionBy("w").orderBy(F.desc("n_events"), "event_type")
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "rank",
        )
    )


@query(
    "events_ohlc_hourly",
    oracle=f"""
    WITH numbered AS (
      SELECT date_trunc('hour', ts) AS bucket, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY date_trunc('hour', ts)) AS cnt
      FROM events
    )
    SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn = cnt THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS total_value
    FROM numbered GROUP BY 1
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open-high-low-close) bars over the event stream —
    the candlestick rollup time-series stores ship as a built-in
    (TimescaleDB's ``first``/``last`` aggregates; here [EXT], no
    reference counterpart). Open/close are the values of the
    chronologically first/last event in the bucket with (ts,
    event_id) as the total order, so ties cannot flap across engines
    or partitionings.

    Plan: ONE exchange on the hour bucket serves the row-numbering
    window, the bucket-count window (same sort, Catalyst shares it)
    and the final aggregate; open/close fall out as conditional
    aggregates instead of a second descending window or an arg-min
    shuffle. Linear, bucket-parallel — at 100 TB the bucket key is
    the natural partition."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    w_rn = W.partitionBy(bucket).orderBy("ts", "event_id")
    w_cnt = W.partitionBy(bucket)
    numbered = ev.select(
        bucket.alias("bucket"),
        "value",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_cnt).alias("cnt"),
    )
    return numbered.groupBy(
        F.date_format("bucket", _FMT).alias("bucket")
    ).agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(
            F.when(F.col("rn") == F.col("cnt"), F.col("value"))
        ).alias("close"),
        F.count("*").alias("n_events"),
        dsum("value", "total_value"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS dst,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS src
      FROM events
    ),
    t AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM ordered WHERE src IS NOT NULL
      GROUP BY src, dst
    )
    SELECT src, dst, n_transitions,
           CAST((n_transitions * 1000000)
                // SUM(n_transitions) OVER (PARTITION BY src)
                AS BIGINT) AS prob_ppm
    FROM t
    """,
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (src, dst) counts from lag() pairs, plus the
    conditional transition probability as an exact integer ppm
    (floor(n·10⁶ / Σ_src) — integer division, so no float ratio can
    flap the hash). One exchange on user_id orders the sequences;
    the (src, dst) aggregate is tiny (|event_type|² rows) and the
    per-src normalization is a window over that tiny result. At
    100 TB the user_id shuffle is the only data-sized stage — the
    plan a clickstream/session-model pipeline needs."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    )
    t = (
        ordered.filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
    wsrc = W.partitionBy("src")
    return (
        t.withColumn(
            "src_total", F.sum("n_transitions").over(wsrc)
        )
        # integer DIV, not float /: floor of a rounded double can
        # disagree with true integer division near exact boundaries
        .select(
            "src",
            "dst",
            "n_transitions",
            F.expr(
                "CAST((n_transitions * 1000000) DIV src_total AS BIGINT)"
            ).alias("prob_ppm"),
        )
    )
