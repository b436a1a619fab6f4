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


ORACLED_QUERIES = sorted(registry.ORACLES)

# DuckDB result types the driver's typed/Arrow value hash cannot match
# against Spark output: Spark has no 128-bit integer, so an oracle
# column typed HUGEINT hash-mismatches even when every value is equal
# (the r6 text_decontaminate_by_source red — VERDICT r6 §What's wrong).
# Integer SUM() in DuckDB widens to HUGEINT; oracles must CAST such
# aggregates to BIGINT.
_UNHASHABLE_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


@pytest.mark.parametrize("name", ORACLED_QUERIES)
def test_oracle_has_no_int128_columns(duck, name):
    """No oracle may type a result column as 128-bit integer — the
    class of driver-side hash mismatch that hit r6. Binding only
    (relation .types), so the sweep over all oracles is cheap."""
    rel = duck.sql(registry.ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(u in str(t).upper() for u in _UNHASHABLE_DUCK_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle columns typed int128 {bad} — wrap the "
        f"aggregate in CAST(... AS BIGINT)"
    )
