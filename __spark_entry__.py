"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference-shaped ingestion
pipeline + per-key stats) at sf0.001. ``queries()`` /``oracle_sql()``
expose every registered operator from SURVEY.md §2 with its DuckDB
oracle twin (see ``kafkatoclickhouse_spark/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafkatoclickhouse_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["ingest_keyed_counts"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys without an entry are
    non-SQL-expressible ops checked rows-only by the driver."""
    return dict(registry.ORACLES)
