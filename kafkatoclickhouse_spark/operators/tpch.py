"""TPC-H-shaped relational queries beyond q1/q3/q5/q10.

Widens the [EXT] aggregation/join rows of SURVEY.md §2.2 with the
classic decision-support shapes the fixture star schema supports
(no partsupp table exists, and lineitem lacks shipmode/commitdate/
receiptdate, so q4/q17/q19/q22 are adapted to the available columns
— the *shape* is what matters: EXISTS semi-joins, scalar subqueries,
disjunctive pushdown, correlated-average filters, anti-join +
global-scalar comparison).

Scale notes: every dim side is broadcast; facts shuffle only on
their join/group keys; all money math is exact-decimal
(functions.exact) so results hash-match DuckDB at any partition
count. The reference has no joins or aggregations at all
(`/root/reference/src/main/scala/` — verified in SURVEY §2.2), so
this whole module is engine-new surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions.exact import (
    davg,
    dec2,
    dsum,
    dsum_dec,
    sql_davg,
    sql_dec2,
    sql_dsum,
    sql_dsum_dec,
)
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_table

_DISC_PRICE_SQL = (
    f"{sql_dec2('l_extendedprice')} * (1 - {sql_dec2('l_discount')})"
)


def _disc_price():
    return dec2("l_extendedprice") * (1 - dec2("l_discount"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi
    residual (l_shipdate > o_orderdate), then count by priority.
    (Fixture lacks l_commitdate/l_receiptdate; the late-ship residual
    keeps the correlated-EXISTS shape.) The semi join shuffles both
    sides on orderkey once; the agg's 5-row domain collapses
    map-side."""
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        od.join(
            li,
            (od.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > od.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT {rev} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """.format(
        rev=sql_dsum_dec(
            f"{sql_dec2('l_extendedprice')} * {sql_dec2('l_discount')}"
        )
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the pushdown showcase.
    All three predicates reach the parquet scan (PushedFilters), only
    (extendedprice, discount, quantity, shipdate) are read, and the
    single global sum is a two-stage partial+final with no shuffle of
    data rows (just one partial per partition)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum_dec(dec2("l_extendedprice") * dec2("l_discount"), "revenue")
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           {rev} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """.format(rev=sql_dsum_dec(_DISC_PRICE_SQL)),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume. Self-join of nation
    under two roles, disjunctive nation-pair predicate, group by
    (supp_nation, cust_nation, year). supplier/customer/nation
    broadcast; lineitem⋈orders is the only exchange."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    od = _t(spark, sf_dir, "orders")
    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum_dec(_disc_price(), "revenue"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer histogram — two chained
    aggregations. First agg shuffles on custkey (the left join
    reuses that exchange); the second's domain is tiny (distinct
    counts) and collapses map-side."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN {dp} ELSE CAST(0 AS DECIMAL(12,2)) END)
                        AS DOUBLE)
                 / CAST(SUM({dp}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """.format(dp=_DISC_PRICE_SQL),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-aggregate ratio. part is broadcast so
    the filtered lineitem never shuffles; both sums ride one
    partial+final pass. Each exact-decimal sum casts to double BEFORE
    the division — decimal-division scale/rounding rules differ per
    engine, IEEE double division doesn't."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    pa = _t(spark, sf_dir, "part")
    dp = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", dp).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            (
                100.0
                * F.sum(promo).cast("double")
                / F.sum(dp).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS agg_partkey,
                 0.2 * AVG(l_quantity) AS avg_quantity
          FROM lineitem GROUP BY l_partkey) part_agg
      ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < avg_quantity
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average (decorrelated to
    an aggregate + self-join — the rewrite Catalyst/DuckDB both
    apply to the textbook form; fixture has no p_container so brand
    alone selects). The per-part agg output is part-domain-sized →
    broadcast; lineitem never shuffles. avg_quantity stays double on
    both sides (comparison only — no summed float)."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("avg_quantity")
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(part_avg), li.l_partkey == F.col("agg_partkey"))
        .filter(F.col("l_quantity") < F.col("avg_quantity"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           {qty} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(24,4))) > 200)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """.format(qty=sql_dsum("l_quantity")),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered IN-subquery → semi join, then
    re-aggregate with the order/customer context and take top-100.
    (Threshold 200 ≈ the fixture's top ~5% of orders; spec's 300
    exceeds this synthetic data's max.) Both lineitem passes shuffle
    on orderkey — at scale AQE reuses the exchange; qualifying keys
    are few → broadcast semi. Deterministic tie-break on orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT {rev} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """.format(rev=sql_dsum_dec(_DISC_PRICE_SQL)),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-arm disjunctive predicate spanning both
    join sides (no p_container/shipmode in fixture; brand+size+qty
    arms keep the shape). Catalyst extracts the common join key and
    pushes per-side residuals (p_brand IN (...) reaches the part
    scan); part broadcasts so the disjunction evaluates without a
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    arm = lambda brand, size_hi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#34", 15, 20, 30)
        )
        .agg(dsum_dec(_disc_price(), "revenue"))
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {bal} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {avgbal} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """.format(bal=sql_dsum("c_acctbal"), avgbal=sql_davg("c_acctbal")),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-scalar subquery (avg positive
    balance) + NOT EXISTS anti join, grouped by nation (fixture has
    no c_phone for country codes). The scalar avg is a 1-row
    DataFrame broadcast into a cross join — never collected to the
    driver; the anti join shuffles on custkey."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "cutoff")
    )
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
