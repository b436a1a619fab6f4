"""R5: per-key tumbling count window, as a stateful streaming op.

Reference semantics (`KafakToClickhouse.scala:57-61`,
`MyWindowFunction.scala:32-56`): buffer N records per ``essCode``;
when the N-th arrives, fire the window with exactly those N records
(the reference then renders them into one multi-row INSERT). Partial
windows NEVER fire — a GlobalWindow with a pure count trigger leaks
buffered records forever on quiet keys (SURVEY §4.3).

Spark has no native count window, so this is the one genuinely
stateful custom operator in the engine (SURVEY §7.6-1):
``applyInPandasWithState`` keeps a per-key buffer in GroupState and
emits annotated rows. We fix the reference's leak with a
processing-time timeout that flushes partials (``flush_reason =
'timeout'`` so the sink can distinguish them).

Scale: state per key is ≤ N buffered rows (N≈20 in prod config,
`test.properties:25`); keys shard across executors by hash — the
same layout as the reference's keyBy, with RocksDB-backed state at
cluster scale (session config, SURVEY §2.1 R9).

Throughput shape (measured, BASELINE.md r8 attribution): the
operator's wall time is the grouped-UDF PROTOCOL, not this code —
an identity ``applyInPandas`` over the same keys costs the same,
and the decomposition is key-shuffle + Arrow transfer + ~0.9 ms of
per-key-per-batch pandas/UDF-call overhead; the state get/put
pickle round-trip is unmeasurable beside it. Consequences: emit one
frame per key-batch (``_annotate_many``), never per window; and at
scale, throughput recovers with rows/key/batch (larger
micro-batches) and with executor count (keys shard) — per-row cost
is NOT constant, it is per-key-batch amortized.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_WINDOW_SIZE = 20  # reference prod default, KafakToClickhouse.scala:57

ANNOTATION_FIELDS = [
    T.StructField("window_id", T.LongType()),
    T.StructField("window_pos", T.IntegerType()),
    T.StructField("flush_reason", T.StringType()),
]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_window", T.LongType()),
        T.StructField("buf", T.BinaryType()),  # pickled pd.DataFrame
    ]
)


def _annotate(
    pdf: pd.DataFrame, window_id: int, reason: str
) -> pd.DataFrame:
    out = pdf.copy()
    out["window_id"] = window_id
    out["window_pos"] = range(len(out))
    out["flush_reason"] = reason
    return out


def _annotate_many(
    pdf: pd.DataFrame, n: int, first_window: int, reason: str
) -> pd.DataFrame:
    """Annotate a run of CONSECUTIVE windows in one vectorized pass:
    row i belongs to window ``first_window + i // n`` at position
    ``i % n``. Emitting one frame per key-batch instead of one per
    fired window removes the per-window ``DataFrame.copy`` loop that
    dominated the legacy path's wall time (measured: ~4.3k window
    copies per 100k-row drain; see tools/stream_bench.py
    --breakdown)."""
    import numpy as np

    out = pdf.copy()
    idx = np.arange(len(out), dtype=np.int64)
    out["window_id"] = first_window + idx // n
    out["window_pos"] = (idx % n).astype(np.int32)
    out["flush_reason"] = reason
    return out


def make_count_window_fn(n: int, timeout_ms: int | None):
    """The per-key state-transition function, exposed for direct unit
    testing with a stub GroupState (timeout paths can't fire under an
    availableNow test trigger). ``timeout_ms=None`` disables the
    partial-flush timer (see :func:`keyed_count_window`)."""

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: Any,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # partial-window flush — the semantics the reference
            # lacks: its quiet keys buffer forever (SURVEY §4.3).
            next_window, raw = state.get
            state.remove()
            buf = pickle.loads(raw)
            if len(buf):
                yield _annotate(buf, next_window, "timeout")
            return

        if state.exists:
            next_window, raw = state.get
            parts = [pickle.loads(raw)]
        else:
            next_window, parts = 0, []
        parts.extend(pdfs)
        buf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()

        n_full = len(buf) // n
        if n_full:
            yield _annotate_many(
                buf.iloc[: n_full * n], n, next_window, "count"
            )
        next_window += n_full
        tail = buf.iloc[n_full * n :].reset_index(drop=True)
        state.update((next_window, pickle.dumps(tail)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

    return fn


def keyed_count_window(
    df: DataFrame,
    key: str = "essCode",
    n: int = DEFAULT_WINDOW_SIZE,
    timeout_ms: int | None = 60_000,
) -> DataFrame:
    """Streaming per-key count window: rows of ``df`` annotated with
    (window_id, window_pos, flush_reason), emitted only when a window
    fires (count reached, or timeout for partials).

    ``timeout_ms=None`` disables the partial-flush timer. Required
    for finite (``availableNow``) runs: with ``ProcessingTimeTimeout``
    Spark schedules no-data micro-batches forever to fire pending
    timers (``FlatMapGroupsWithStateExec.shouldRunAnotherBatch`` is
    unconditionally true for processing-time timeouts), so the query
    never terminates. A drain-the-backlog run holds partial tails in
    checkpointed state instead — the reference's own count-only
    semantics. Continuous streams keep the timer: it is the fix for
    the reference's forever-stuck partial windows (SURVEY §4.3).

    Works on a streaming DataFrame grouped by ``key``; output mode
    append. Downstream, ``sink.foreach_batch_writer`` groups on
    (key, window_id) to write one batch per fired window — the
    equivalent of the reference's one-INSERT-per-window.
    """
    out_schema = T.StructType(list(df.schema.fields) + ANNOTATION_FIELDS)
    return df.groupBy(key).applyInPandasWithState(
        make_count_window_fn(n, timeout_ms),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            "NoTimeout" if timeout_ms is None else "ProcessingTimeTimeout"
        ),
    )


# -- transformWithState twin (Spark 4 arbitrary-state API) ------------------
#
# Same semantics on the successor API: typed per-key state handles
# (ValueState here; List/Map state and TTL are available), explicit
# timer registration instead of a single timeout, and a RocksDB-only
# state store. New jobs should start here; applyInPandasWithState
# above is kept as the widely-deployed form and as the semantics
# reference (its transition fn is unit-testable without a stream).
# Runtime dependency: the transformWithState state protocol needs
# the ``protobuf`` package on driver and executors (absent from this
# test container, so the parity test self-skips; the operator needs
# no other setup).


def make_count_window_processor(n: int):
    """StatefulProcessor with the same emit rules as
    :func:`make_count_window_fn` (count-fired windows only; tails
    stay in state — timer-based partial flush would register a
    processing-time timer in ``handleInputRows`` and emit in
    ``handleExpiredTimer``, omitted so finite availableNow runs
    terminate, exactly like ``timeout_ms=None``)."""
    from pyspark.sql.streaming import StatefulProcessor

    class CountWindowProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("win", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterable[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                next_window, raw = self._state.get()
                parts = [pickle.loads(raw)]
            else:
                next_window, parts = 0, []
            parts.extend(rows)
            buf = (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame()
            )
            n_full = len(buf) // n
            if n_full:
                yield _annotate_many(
                    buf.iloc[: n_full * n], n, next_window, "count"
                )
            next_window += n_full
            tail = buf.iloc[n_full * n :].reset_index(drop=True)
            self._state.update((next_window, pickle.dumps(tail)))

        def close(self) -> None:
            pass

    return CountWindowProcessor()


def keyed_count_window_tws(
    df: DataFrame,
    key: str = "essCode",
    n: int = DEFAULT_WINDOW_SIZE,
) -> DataFrame:
    """:func:`keyed_count_window` on ``transformWithStateInPandas``.
    Requires the RocksDB state store provider (the API rejects the
    default HDFS-backed one):

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    """
    out_schema = T.StructType(list(df.schema.fields) + ANNOTATION_FIELDS)
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=make_count_window_processor(n),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
