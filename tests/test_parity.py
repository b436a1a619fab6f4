"""Every registered query matches its DuckDB oracle at sf0.001 —
the same gate the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from kafkatoclickhouse_spark import oracle, registry

ALL_QUERIES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    problems = oracle.compare_query(spark, duck, name, sf_dir)
    assert not problems, f"{name}: {'; '.join(problems)}"


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_rows_only_queries_produce_rows(spark, sf_dir, name):
    """Rows-only queries (no oracle) must still run and return a
    stable schema; most must be non-empty at sf0.001."""
    if name in registry.ORACLES:
        pytest.skip("oracle-checked elsewhere")
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    df.count()  # executes; raising = fail


def test_entry_contract():
    """__spark_entry__ exposes the driver's three functions and every
    oracle key is a registered query."""
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() empty"
    assert set(os_) <= set(qs), "oracle for unregistered query"


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
