"""Streaming observability: progress collection + observed metrics.

The reference's operational surface is println (dirty records,
`MyKafkaDeserializationSchema.scala:54`; sink failures,
`ClickHouseSink.scala:56-66`). The Spark-native equivalents:

- ``df.observe`` metrics (``operators.ingest.observed_clean``) ride
  each micro-batch and surface in progress events — validation
  counters cost zero extra passes.
- A ``StreamingQueryListener`` receives every progress event
  (rows/sec, batch durations, state-store sizes, observed metrics) —
  the hook a production job uses to export to its metrics system.
  :class:`ProgressCollector` is the in-memory form used by tests and
  as the template.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Collects every query-progress event. ``rates()`` summarizes
    throughput; ``observed(name)`` pulls a named observe() metric
    row per batch."""

    def __init__(self) -> None:
        self.progress: list[Any] = []

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802 (API)
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        self.progress.append(event.progress)

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass

    def rates(self) -> list[tuple[int, float]]:
        """(numInputRows, processedRowsPerSecond) per batch."""
        return [
            (p.numInputRows, p.processedRowsPerSecond)
            for p in self.progress
        ]

    def observed(self, name: str) -> list[dict]:
        """The named ``observe`` metric values, one dict per batch
        that carried them."""
        out = []
        for p in self.progress:
            m = (p.observedMetrics or {}).get(name)
            if m is not None:
                out.append(m.asDict())
        return out
