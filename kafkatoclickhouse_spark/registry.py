"""Central query registry.

Every operator the engine claims (SURVEY.md §2.2) registers here a
named builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are ANSI-SQL-expressible, an exact DuckDB oracle SQL twin.
The driver harness consumes this via ``__spark_entry__.py``.

Contract (BASELINE.json): oracle results must match on row count,
schema, and order-insensitive value hash — so every builder aliases
its computed columns to the same names as its oracle and casts to
the same logical types, and every aggregate over floating point uses
the decimal-exact helpers in ``functions.exact`` (bit-stable under
any partitioning — see that module's docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query builder and optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module for registration side effects."""
    from kafkatoclickhouse_spark import sql as _sql  # noqa: F401
    from kafkatoclickhouse_spark.operators import (  # noqa: F401
        advanced as _advanced,
        asof as _asof,
        bigramlm as _bigramlm,
        bpetrain as _bpetrain,
        cdc as _cdc,
        classifier as _classifier,
        decontam as _decontam,
        dedup as _dedup,
        dsir as _dsir,
        embedprep as _embedprep,
        event_windows as _event_windows,
        forensics as _forensics,
        graph as _graph,
        htmlx as _htmlx,
        kmeans as _kmeans,
        mixture as _mixture,
        multimodal as _multimodal,
        pq as _pq,
        queries as _queries,
        retrieval as _retrieval,
        semdedup as _semdedup,
        similarity as _similarity,
        text as _text,
        tpch as _tpch,
        tpch2 as _tpch2,
        winnow as _winnow,
    )
