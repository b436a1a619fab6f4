"""Stream-stream joins (SURVEY §2.2 "Joins" — streaming form; the
reference joins nothing, §2.2 row "Joins": absent).

Structured Streaming's inner stream-stream join buffers BOTH sides in
the state store until a match can be ruled out. Two things bound that
state: a watermark on each side's event-time column, and a time-range
join condition tying the two event times together — given both, Spark
derives how long each buffered row can still match and evicts it
afterwards. Without the range condition the state grows without
bound, which is why :func:`interval_join` requires explicit ts
columns instead of accepting an arbitrary equi-join.

State size at scale = input rate × (watermark delay + join horizon),
per side — independent of total history, which is what makes this
viable on an unbounded 100 TB/day feed.

The same builders run in batch mode (watermark is a no-op on bounded
frames — ``windows.with_watermark``), so the oracle-checked batch
twin ``operators.asof.interval_join_events`` and the streaming smoke
test in ``tests/test_streaming.py`` share one plan definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.streaming.windows import with_watermark


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner join of two (possibly streaming) frames on a SQL
    condition that MUST constrain ``right_ts`` relative to
    ``left_ts`` (e.g. ``r_ts >= l_ts AND r_ts <= l_ts + INTERVAL 1
    HOUR``) — the range bound is what lets Spark age out join state.
    Column names across the two sides must be disjoint; the
    condition is given as SQL text so it resolves against the
    watermarked frames, not the pre-watermark parents."""
    lhs = with_watermark(left, left_ts, watermark)
    rhs = with_watermark(right, right_ts, watermark)
    return lhs.join(rhs, F.expr(on))


def split_clicks_purchases(
    events: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Project the events feed into the two disjointly-named sides of
    the click→purchase attribution join. One source can feed both
    sides of a stream-stream join (Spark plans two scans of it)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "1 HOUR",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Every purchase by the same user within ``horizon`` after a
    click. Batch twin registered as ``interval_join_events``."""
    cond = (
        "user_id = p_user_id AND purchase_ts >= click_ts "
        f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
    )
    return interval_join(
        clicks,
        purchases,
        cond,
        left_ts="click_ts",
        right_ts="purchase_ts",
        watermark=watermark,
    ).select("click_id", "user_id", "purchase_id", "purchase_value")


def click_purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "1 HOUR",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, with its
    attributed purchase(s) or NULLs if none arrived in the horizon.

    Outer semantics under streaming are subtle and worth pinning: a
    click's NULL row can only be emitted once the watermark proves no
    matching purchase can still arrive (click_ts + horizon is behind
    the purchase-side watermark). Until then the click sits in state.
    So outer results trail the inner results by up to
    watermark + horizon — that lag is the price of correctness, not a
    bug, and the state bound is the same input-rate × horizon window
    as the inner join."""
    lhs = with_watermark(clicks, "click_ts", watermark)
    rhs = with_watermark(purchases, "purchase_ts", watermark)
    cond = (
        "user_id = p_user_id AND purchase_ts >= click_ts "
        f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
    )
    return lhs.join(rhs, F.expr(cond), "leftOuter").select(
        "click_id", "user_id", "click_ts", "purchase_id", "purchase_value"
    )
