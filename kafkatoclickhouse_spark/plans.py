"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: filters must reach the parquet
scan (PushedFilters), projections must prune the read schema
(ReadSchema), small-dimension joins must broadcast, and hot relational
paths must stay JVM-side (no row-at-a-time Python eval). Tests assert
these properties on the registered queries so a regression that is
invisible at sf0.001 (e.g. a filter silently becoming post-scan) still
fails CI.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string."""
    try:
        jvm = df.sparkSession._jvm
        em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return df._jdf.queryExecution().explainString(em)
    except Exception:  # noqa: BLE001 — connect/API drift: capture print
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lines from every scan in the plan."""
    return "\n".join(
        line
        for line in plan_string(df).splitlines()
        if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> str:
    return "\n".join(
        line
        for line in plan_string(df).splitlines()
        if "ReadSchema" in line
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment (e.g. ``IsNotNull(l_shipdate)``,
    ``GreaterThan``) appears in some scan's PushedFilters."""
    got = pushed_filters(df)
    missing = [f for f in fragments if f not in got]
    assert not missing, (
        f"filters not pushed to scan: {missing}\nPushedFilters: {got}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_jvm_only(df: DataFrame) -> None:
    """No row-at-a-time Python UDF in the plan. Arrow-batched pandas
    evals (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas) are
    allowed — they are the sanctioned slow path."""
    plan = plan_string(df)
    assert "BatchEvalPython" not in plan, (
        f"row-at-a-time Python UDF in plan:\n{plan}"
    )


def executed_plan(df: DataFrame):
    """Execute ``df`` (full pipeline, results discarded batch-wise on
    the driver via toLocalIterator) and return its post-AQE executed
    plan root (JVM SparkPlan). After execution the adaptive plan is
    final, so counts taken from it reflect what actually ran."""
    for _ in df.toLocalIterator():
        pass
    return df._jdf.queryExecution().executedPlan()


def count_executed_shuffles(df: DataFrame) -> int:
    """The number of shuffle exchanges that EXECUTED for ``df`` —
    post-AQE, with cached sub-plans counted once (their shuffles ran
    only at materialization, however many consumers re-print them in
    the static plan; the r6 `exch` overcount, VERDICT r6 #4).
    Broadcast exchanges and reused exchanges are excluded."""
    jvm = df.sparkSession._jvm
    seen_caches: set[int] = set()

    def walk(node) -> int:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan())
        if cls.endswith("QueryStageExec"):
            # the stage's plan IS the exchange it materialized
            # (Shuffle/Broadcast/ReusedExchangeExec) — recurse and let
            # the exchange node count itself, else it counts twice
            return walk(node.plan())
        if cls == "ReusedExchangeExec":
            return 0  # ran once elsewhere
        if cls == "InMemoryTableScanExec":
            cached = node.relation().cachedPlan()
            key = jvm.java.lang.System.identityHashCode(cached)
            if key in seen_caches:
                return 0
            seen_caches.add(key)
            return walk(cached)
        total = 1 if cls == "ShuffleExchangeExec" else 0
        ch = node.children()
        for i in range(ch.size()):
            total += walk(ch.apply(i))
        return total

    return walk(executed_plan(df))


def executed_plan_string(df: DataFrame, mode: str = "simple") -> str:
    """Explain string AFTER executing ``df`` — AQE sections print
    `isFinalPlan=true` with runtime join selections (an SMJ the
    planner chose but AQE demoted to broadcast shows as broadcast
    here, unlike the static string)."""
    for _ in df.toLocalIterator():
        pass
    try:
        jvm = df.sparkSession._jvm
        em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return df._jdf.queryExecution().explainString(em)
    except Exception:  # noqa: BLE001 — connect/API drift
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()
