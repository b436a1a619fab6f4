"""SQL entry point: run ANSI SQL directly against the fixture tables.

The DataFrame operators and this SQL surface compile to the same
Catalyst logical plans — ``load_tables`` registers every fixture
parquet as a temp view, so a user can express any engine query in
SQL instead of the DataFrame API and get identical physical plans
(broadcast joins, scan pushdown, whole-stage codegen).

The registered queries below make that claim checkable: each one's
*implementation* is ``spark.sql(SQL)`` and its *oracle* is the very
same SQL string run by DuckDB — one dialect-portable ANSI statement,
two engines, hash-identical results. (Portability rules baked into
the statements: ``ROW_NUMBER()`` cast to INTEGER because DuckDB
returns BIGINT where Spark returns INT; money math enters
DECIMAL(12,2) before multiplying and sums cast to DOUBLE — same
determinism rules as ``functions.exact``; derived tables carry an
alias, which older Spark requires.)

The reference has no SQL layer at all (verified in SURVEY §1 — the
whole program is one hand-built Flink dataflow,
``/root/reference/src/main/scala/KafakToClickhouse.scala:48-63``),
so this module is engine-new surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_tables

SQL_NATION_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""

SQL_SEGMENT_TOPK = """
SELECT c_mktsegment, c_name, c_acctbal, rnk FROM (
  SELECT c_mktsegment, c_name, c_acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal DESC, c_custkey)
              AS INTEGER) AS rnk
  FROM customer) t
WHERE rnk <= 5
"""

SQL_EXISTS_RETURNS = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the fixture views and run one SQL statement.

    View registration is idempotent (createOrReplaceTempView) and
    driver-side only — no data is read until the returned plan
    executes, so repeated calls cost nothing but catalog updates.
    """
    load_tables(spark, sf_dir)
    return spark.sql(sql)


@query("sql_nation_revenue", oracle=SQL_NATION_REVENUE)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate expressed as pure SQL: one string drives both
    engines. Catalyst plans it identically to the DataFrame form —
    nation/customer broadcast, lineitem⋈orders the only exchange."""
    return run_sql(spark, sf_dir, SQL_NATION_REVENUE)


@query("sql_segment_topk", oracle=SQL_SEGMENT_TOPK)
def sql_segment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL window function with rank filter (top-5 per segment).
    The rnk <= 5 predicate becomes a WindowGroupLimit at plan time
    — Spark pushes the limit into the sort, so each partition keeps
    5 rows instead of sorting everything."""
    return run_sql(spark, sf_dir, SQL_SEGMENT_TOPK)


@query("sql_exists_returns", oracle=SQL_EXISTS_RETURNS)
def sql_exists_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS in SQL — Catalyst decorrelates it to a
    left-semi join on orderkey with the returnflag filter pushed to
    the lineitem scan (same plan the hand-written q4 shape builds)."""
    return run_sql(spark, sf_dir, SQL_EXISTS_RETURNS)


SQL_GROUPING_SETS_QTY = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""

SQL_EXCEPT_ALL_CUSTKEYS = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""

SQL_INTERSECT_ACTIVE_RICH = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""

SQL_MOVING_SUM_EVENTS = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(24,4)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS moving_sum
FROM events
"""

SQL_MONTHLY_REVENUE = """
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CAST(DATE_TRUNC('month', o_orderdate) AS DATE)
"""


@query("sql_grouping_sets_qty", oracle=SQL_GROUPING_SETS_QTY)
def sql_grouping_sets_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS in portable SQL. Spark plans one Expand (each
    input row fans to the 3 grouping sets map-side) feeding a single
    HashAggregate — one shuffle total, same cost shape as a plain
    group-by at 100 TB. GROUPING() disambiguates a real NULL key from
    a rolled-up one; both engines cast it to INTEGER for hash parity."""
    return run_sql(spark, sf_dir, SQL_GROUPING_SETS_QTY)


@query("sql_except_all_custkeys", oracle=SQL_EXCEPT_ALL_CUSTKEYS)
def sql_except_all_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference with multiplicity (a customer
    with 3 open and 1 fulfilled order survives twice). Both engines
    compile it to a count-tagged aggregate + generate, one shuffle on
    the value; no row-order sensitivity."""
    return run_sql(spark, sf_dir, SQL_EXCEPT_ALL_CUSTKEYS)


@query("sql_intersect_active_rich", oracle=SQL_INTERSECT_ACTIVE_RICH)
def sql_intersect_active_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) across two differently-named inputs —
    output column names come from the left side in both dialects.
    Spark plans a left-semi hash join over distinct keys."""
    return run_sql(spark, sf_dir, SQL_INTERSECT_ACTIVE_RICH)


@query("sql_moving_sum_events", oracle=SQL_MOVING_SUM_EVENTS)
def sql_moving_sum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame (6 PRECEDING .. CURRENT ROW) moving sum.
    The (ts, event_id) ORDER BY is a total order per user, and the
    decimal-cast sum makes the frame accumulation engine-exact — a
    bare double SUM OVER would diverge between Spark's running
    accumulator and DuckDB's segment tree."""
    return run_sql(spark, sf_dir, SQL_MOVING_SUM_EVENTS)


@query("sql_monthly_revenue", oracle=SQL_MONTHLY_REVENUE)
def sql_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC month rollup — the canonical time-partitioned
    aggregate. The truncation is a scalar expression, so Catalyst
    still prunes to the two scanned columns and partial-aggregates
    map-side before the single month-keyed exchange."""
    return run_sql(spark, sf_dir, SQL_MONTHLY_REVENUE)


SQL_LATERAL_TOPK = """
SELECT n.n_name, t.c_name, t.c_acctbal, t.rnk
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal,
         CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey)
              AS INTEGER) AS rnk
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""

SQL_RECURSIVE_DATE_SPINE = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '1996-01-01'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1996-03-31'
)
SELECT CAST(dy.d AS VARCHAR(10)) AS day,
       COUNT(o.o_orderkey) AS n_orders
FROM days dy
LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = dy.d
GROUP BY dy.d
"""


@query("sql_lateral_topk", oracle=SQL_LATERAL_TOPK)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table — top-2 customers per nation
    where the per-group limit lives INSIDE the lateral subquery, the
    SQL-standard alternative to the window-filter idiom
    (`sql_segment_topk`). Catalyst decorrelates the lateral into a
    ranked window join, so the physical plan matches the idiomatic
    form — one dialect-portable string, two engines, hash-equal."""
    return run_sql(spark, sf_dir, SQL_LATERAL_TOPK)


@query("sql_recursive_date_spine", oracle=SQL_RECURSIVE_DATE_SPINE)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.1's recursive CTE support) generating
    a 91-day calendar spine, LEFT-joined to per-day order counts —
    the gapfill-by-recursion idiom (zero-order days survive with
    n_orders = 0), portable verbatim to DuckDB. The recursion is
    driver-bounded (one row per day) while the join and aggregate
    stay distributed; the date spine is the same shape
    `timeseries_gapfill_ffill` builds with `sequence()`, here in
    pure SQL."""
    return run_sql(spark, sf_dir, SQL_RECURSIVE_DATE_SPINE)
