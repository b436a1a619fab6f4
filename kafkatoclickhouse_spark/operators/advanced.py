"""Advanced operator surface: pandas-UDF demo, exact percentiles,
skew-safe two-phase aggregation, RANGE window frames.

All [EXT] (SURVEY §2.2: the reference has no aggregation, window
function, or UDF surface at all). The pandas UDF here is deliberately
a *demo of the sanctioned slow path* — everything it computes is also
expressible with higher-order functions (``functions.vector.norm``),
and the docstring says when to choose which.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kafkatoclickhouse_spark.functions.exact import dsum, sql_dsum
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_table


# -- Arrow-batched scalar pandas UDF ---------------------------------------


def _l2_norm_udf():
    """L2 norm per embedding, sequential accumulation (matches the
    oracle's list_dot_product fold; numpy's pairwise summation would
    drift in the last ulps). Built lazily: pandas_udf type parsing
    needs an active SparkSession."""

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(
            lambda v: sum(float(x) * float(x) for x in v) ** 0.5
        )

    return l2_norm


@query(
    "udf_pandas_vector_norm",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 6)
             AS l2_norm
    FROM embeddings
    """,
)
def udf_pandas_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over the embedding column (ArrowEvalPython
    in the plan — Arrow batch transfer, never row-at-a-time).

    This exists to pin the UDF surface; the same computation stays
    fully JVM-side as ``functions.vector.norm`` (used by every
    similarity operator). Rule of thumb at 100 TB: higher-order
    functions when the math is expressible, pandas UDF when you need
    numpy/scipy, never ``F.udf``."""
    em = load_table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.round(_l2_norm_udf()(F.col("embedding")), 6).alias("l2_norm"),
    )


# -- exact percentiles ------------------------------------------------------


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS price_p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (``percentile``, not the
    t-digest ``percentile_approx``): both engines sort the same
    multiset and interpolate identically, so this oracle-matches. At
    100 TB switch to ``percentile_approx`` — sketch-mergeable,
    no global sort — implemented as ``agg_approx_percentile`` below
    (exact below accuracy, deterministic oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias(
            "price_p95"
        ),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS q50,
           quantile_disc(l_quantity, 0.95) AS q95,
           quantile_disc(l_extendedprice, 0.5) AS price_q50
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``percentile_approx`` (mergeable
    Greenwald-Khanna sketch, map-side partials, no global sort — the
    scale twin ``agg_percentiles``'s docstring promises).

    Accuracy adapts to table size, same pattern as the adaptive LSH:
    below 2M rows (every driver fixture scale) accuracy=1e6 makes the
    sketch hold every sample and return the EXACT discrete quantile —
    the same element DuckDB's ``quantile_disc`` picks, so the oracle
    is deterministic, not an envelope. Above 2M rows the query
    switches to Spark's default accuracy=1e4 — the configuration a
    real 100 TB run uses. The sf10 scale curve forced this split:
    at accuracy=1e6 the 32 map-side partials each carry a ~1e6-entry
    sketch and the merge dominated (123s at sf10, 12.7× flagged
    hop); at 1e4 the same plan is sketch-sized and linear. The
    count() that picks the branch is parquet-metadata-only."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = 1_000_000 if li.count() <= 2_000_000 else 10_000
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, acc).alias("q50"),
        F.percentile_approx("l_quantity", 0.95, acc).alias("q95"),
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("price_q50"),
    )


# -- skew-safe two-phase aggregation ---------------------------------------

N_SALTS = 16


@query(
    "agg_salted_two_phase",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_dsum("value")} AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: groupBy(key, salt) partial →
    groupBy(key) final. The manual skew pattern for when one key
    carries 10⁹ rows: phase 1 spreads the hot key over N_SALTS
    reducers, phase 2 merges N_SALTS tiny partials per key. The
    result is identical to a direct groupBy (this oracle proves it);
    decimal-exact sums make it bit-stable under any salting. (With
    AQE skew handling on — our session default — Catalyst does this
    re-split automatically for *joins*; aggregation salting is still
    a hand pattern.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "salt", (F.col("event_id") % N_SALTS).cast("int")
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pc"),
        F.sum(F.col("value").cast("decimal(24,4)")).alias("ps"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.sum("ps").cast("double").alias("total_value"),
    )


# -- skew-safe salted join --------------------------------------------------


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {sql_dsum("l_extendedprice")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join: the fact side gets a deterministic salt
    in [0, N_SALTS) from columns that vary WITHIN a join key
    (crc32 of orderkey#linenumber), the other side is replicated
    ×N_SALTS, and the join key becomes (orderkey, salt) — so a hot
    orderkey's rows land on N_SALTS reducers instead of one. The
    result is identical to the unsalted join (this oracle proves
    it). This is the manual form of what AQE skew-join splitting
    does at runtime — kept as an explicit operator for engines/jobs
    where the replicated side is too big to broadcast but a known
    hot key would stall a single reducer. Salting multiplies the
    replicated side's shuffle volume by N_SALTS: at 100 TB pick
    N_SALTS = ceil(hot-key rows / target partition rows), not more."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    salted_li = li.withColumn(
        "salt",
        F.pmod(
            F.crc32(
                F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber"))
            ),
            F.lit(N_SALTS),
        ).cast("int"),
    )
    replicated_od = od.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    )
    return (
        salted_li.join(
            replicated_od,
            (salted_li.l_orderkey == replicated_od.o_orderkey)
            & (salted_li.salt == replicated_od.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_extendedprice", "revenue"),
        )
    )


# -- RANGE window frame -----------------------------------------------------


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_near
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, how
    many of their orders cost within 10 000 below this one. Unlike
    ROWS frames, peers with equal order value share results."""
    od = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_near"),
    )


# -- distribution window functions ------------------------------------------


@query(
    "window_distribution_ranks",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           FLOOR(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0
             AS pct_rank,
           FLOOR(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0
             AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile/percent_rank/cume_dist
    per nation over account balance. ntile's bucket assignment
    depends on peer order, so the window orders by
    (c_acctbal, c_custkey): the unique tiebreak is what makes the
    result deterministic under any partitioning (and therefore
    hash-checkable — same rule as collect_list's sort).

    6-dp rounding is the engine-stable ``stable_round6``
    (functions.exact) — floor(x*1e6 + 0.5)/1e6, NOT round(x, 6),
    which splits cross-engine on half-ULP ties like percent_rank =
    0.0640625 (first seen at sf0.1; rationale at the helper)."""
    from kafkatoclickhouse_spark.functions.exact import (
        stable_round6 as _r6,
    )

    cu = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cu.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        _r6(F.percent_rank().over(w)).alias("pct_rank"),
        _r6(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over each customer's
    order history (ordered by date with a unique tiebreak — the rule
    that makes positional window functions deterministic).
    last_value needs the UNBOUNDED FOLLOWING frame in BOTH engines:
    the default frame ends at CURRENT ROW, where last_value
    degenerates to the row itself."""
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return od.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# -- statistical aggregates from exact partial sums -------------------------


@query(
    "agg_stats_corr",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
           ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_qd,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS corr_qd
    FROM s
    """,
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev/covariance/correlation assembled from
    exact decimal partial sums (n, Σx, Σy, Σx², Σy², Σxy) — the
    sufficient-statistics form. Spark's builtin stddev/corr stream
    doubles in partition order and drift run-to-run; the sufficient
    statistics are exact integers-in-decimal, merge associatively
    (the same property the mergeable-sketch queries lean on), and the
    closed-form combination is one deterministic double expression.
    Restricted to 2dp columns whose squared sums stay under 2^53 so
    the decimal→double conversion is lossless in any engine — for
    money-scale columns, shift the decimal scale instead."""
    li = load_table(spark, sf_dir, "lineitem")
    from kafkatoclickhouse_spark.functions.exact import dec2

    x = dec2("l_quantity")
    y = dec2("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias(
            "stddev_qty"
        ),
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("covar_qd"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qd"),
    )


# -- heavy hitters ----------------------------------------------------------

HH_THRESHOLD_PPM = 9_000  # items covering >= 0.9% of all rows


@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH cnt AS (
      SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(c) AS n FROM cnt)
    SELECT l_partkey, c AS n_rows,
           CAST(c * 1000000 // n AS BIGINT) AS share_ppm
    FROM cnt, tot
    WHERE c * 1000000 // n >= {HH_THRESHOLD_PPM}
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: keys covering ≥0.9% of the table, with
    integer-ppm shares (floor-quantized — exact cross-engine, no
    double ROUND tie hazard). Two-phase: per-key partial counts (one
    narrow exchange), scalar total broadcast back, map-side filter.
    This exact form IS the 100 TB shape when the key space fits an
    aggregate (counts are 16 bytes/key); for unbounded key spaces the
    sketch alternative (Misra-Gries / count-min) trades exactness for
    fixed memory — documented, not needed for grouped counts here."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    # integer `div`, not floor(double /): exact at any magnitude
    share_ppm = F.expr("(c * 1000000) div n")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            F.col("c").alias("n_rows"),
            share_ppm.cast("long").alias("share_ppm"),
        )
        .filter(F.col("share_ppm") >= HH_THRESHOLD_PPM)
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH x AS (SELECT event_id, event_type, value,
                      CAST(ROUND(value * 100) AS HUGEINT) AS xi
               FROM events),
    st AS (SELECT event_type, COUNT(*) AS n, SUM(xi) AS s,
                  SUM(xi * xi) AS ss
           FROM x GROUP BY event_type)
    SELECT x.event_id, x.event_type, x.value,
           CAST((st.n * x.xi - st.s) * (st.n * x.xi - st.s)
                > 4 * (st.n * st.ss - st.s * st.s) AS BOOLEAN)
             AS is_anomaly
    FROM x JOIN st USING (event_type)
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 2-sigma outlier flag on event values — the metric-
    monitoring primitive (alert when a reading deviates from its
    fleet's distribution, the reference domain's natural next query
    over its essCode telemetry).

    |x - mean| > 2*sigma is decided EXACTLY, with no sqrt, no
    division, and no float accumulation: values are 2-dp by
    construction, so xi = round(100*value) is an integer, and the
    test rewrites algebraically to

        (n*xi - S)^2  >  4 * (n*SS - S^2),      S = sum xi, SS = sum xi^2

    — pure integer products both engines compute identically (DuckDB
    int128, Spark decimal(38,0); magnitudes stay under 10^23 even at
    10^7 rows per key). A naive stddev_pop comparison would be
    order-dependent in the 15th digit and flap on the boundary rows
    under different partitionings — the same reason the exact-decimal
    helpers exist for money sums.

    Plan: one map-side-combinable groupBy over (type) -> 5-row stats
    frame -> broadcast join back, then a row-local comparison. Two
    narrow shuffles of scalars at any scale."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    x = ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 100).cast(dec).alias("xi"),
    )
    st = x.groupBy("event_type").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("xi").alias("s"),
        F.sum(F.col("xi") * F.col("xi")).alias("ss"),
    )
    j = x.join(F.broadcast(st), "event_type")
    dev = F.col("n") * F.col("xi") - F.col("s")
    rhs = F.lit(4).cast(dec) * (
        F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    )
    return j.select(
        "event_id",
        "event_type",
        "value",
        (dev * dev > rhs).alias("is_anomaly"),
    )


_PROFILE_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _sql_profile_norm(expr: str, kind: str) -> str:
    if kind == "num":
        return f"CAST(CAST({expr} AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S.%f')"
    return f"CAST({expr} AS VARCHAR)"


def _sql_profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        parts.append(f"""
    SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {_sql_profile_norm(f"MIN({c})", kind)} AS min_value,
           {_sql_profile_norm(f"MAX({c})", kind)} AS max_value
    FROM lineitem""")
    return " UNION ALL ".join(parts)


def _profile_norm(col, kind: str):
    if kind == "num":
        return col.cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return col.cast("string")


@query("profile_lineitem", oracle=_sql_profile_oracle())
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling — per column of the fact table: row count,
    null count, EXACT distinct count, and min/max (normalized
    per-type to a cross-engine-stable string: ints verbatim, money
    doubles via DECIMAL(18,2) so neither engine's float-to-string
    shortest-repr rules leak in, timestamps at fixed microsecond
    format). The ingest-acceptance report every pipeline runs before
    trusting a new drop.

    Plan: ONE scan, one aggregate producing all metrics, then a
    ``stack`` pivot of the single result row into per-column rows —
    min/max/count are plain partial aggs; the multi-column exact
    DISTINCT goes through Spark's Expand (input ×C for C profiled
    columns), the documented cost of exactness in one pass. The
    oracle re-aggregates per column instead (C scans) — same
    numbers. At 100 TB you'd flip the distinct columns to
    approx_count_distinct and keep everything else identical; exact
    is kept here because approximate counts cannot hash-match an
    oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            _profile_norm(F.min(c), kind).alias(f"{c}__mn"),
            _profile_norm(F.max(c), kind).alias(f"{c}__mx"),
        ]
    row = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx"
        for c, _ in _PROFILE_COLS
    )
    return row.select(
        "__n",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(col_name, n_nonnull, n_distinct, min_value, max_value)"
        ),
    ).select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


HIST_BIN_WIDTH = 50


@query(
    "events_value_histogram",
    oracle=f"""
    WITH b AS (SELECT CAST(FLOOR(value / {HIST_BIN_WIDTH}) AS BIGINT)
                        AS bin,
                      COUNT(*) AS n
               FROM events GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM b)
    SELECT b.bin,
           b.bin * {HIST_BIN_WIDTH} AS lo,
           (b.bin + 1) * {HIST_BIN_WIDTH} AS hi,
           b.n,
           CAST(FLOOR(b.n * 1000000 / CAST(t.total AS DOUBLE))
                AS BIGINT) AS share_ppm
    FROM b, t
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram with exact integer ppm shares —
    the distribution overview that pairs with the percentile and
    heavy-hitter sketches. Bin ids are floor(value/width) so bins are
    stable under any data order; shares use floor-of-exact-division
    on integers below 2^53, so no engine rounding tie can move a
    count between renderings.

    Plan: one map-side-combinable groupBy on the bin id (bins ≤
    range/width regardless of row count), plus a 1-row total
    broadcast — the aggregate state is O(bins) at any scale."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            F.floor(F.col("value") / HIST_BIN_WIDTH)
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )
    t = b.agg(F.sum("n").alias("total"))
    return b.crossJoin(F.broadcast(t)).select(
        "bin",
        (F.col("bin") * HIST_BIN_WIDTH).alias("lo"),
        ((F.col("bin") + 1) * HIST_BIN_WIDTH).alias("hi"),
        "n",
        F.floor(
            F.col("n") * 1000000 / F.col("total").cast("double")
        )
        .cast("long")
        .alias("share_ppm"),
    )


# -- Bloom-filter prefilter (the 100 TB join-pruning sketch) -----------------

BLOOM_BITS = 8192
BLOOM_HASHES = 3


def _bloom_hash_sql(key_expr: str, seed: int) -> str:
    # composed from the SINGLE portable-hash definition so a hash
    # change updates the Spark side and this oracle together
    from kafkatoclickhouse_spark.functions.hashing import (
        sql_portable_hash64,
    )

    h = sql_portable_hash64(f"CAST({key_expr} AS VARCHAR)", seed)
    return f"{h} % {BLOOM_BITS}"


@query(
    "agg_bloom_prefilter_join",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
      SELECT DISTINCT {_bloom_hash_sql("o_custkey", 0)} AS bit FROM keys
      UNION
      SELECT DISTINCT {_bloom_hash_sql("o_custkey", 1)} FROM keys
      UNION
      SELECT DISTINCT {_bloom_hash_sql("o_custkey", 2)} FROM keys
    ),
    probe AS (
      SELECT c_custkey,
             ({_bloom_hash_sql("c_custkey", 0)} IN (SELECT bit FROM bits)
              AND {_bloom_hash_sql("c_custkey", 1)} IN (SELECT bit FROM bits)
              AND {_bloom_hash_sql("c_custkey", 2)} IN (SELECT bit FROM bits))
               AS bloom_pos,
             c_custkey IN (SELECT o_custkey FROM keys) AS is_member
      FROM customer
    )
    SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_build_keys,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_positive,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_members,
           CAST(SUM(CASE WHEN bloom_pos AND NOT is_member
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives
    FROM probe
    """,
)
def agg_bloom_prefilter_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Portable Bloom-filter build + probe (Bloom 1970): the
    join-pruning sketch a 100 TB pipeline ships to the scan side
    instead of a multi-TB shuffle. Build: the distinct urgent-order
    custkeys hash through {BLOOM_HASHES} portable md5 functions into
    a {BLOOM_BITS}-bit set (materialized as a distinct bit table —
    at most k·|keys| narrow rows, broadcastable by construction).
    Probe: every customer is bloom-positive iff all k of its bits are
    set; the summary row counts build keys, set bits, bloom
    positives, true members (exact semi-join) and false positives —
    the sketch's measurable precision. Spark's native
    ``bloom_filter_agg`` does this JVM-side with the same plan shape;
    the md5 family keeps it oracle-replayable (swap noted in
    functions/hashing.py). One tiny shuffle on the distinct keys;
    bit-set and key-set joins are broadcasts; no row ever carries
    more than (key, bit)."""
    from kafkatoclickhouse_spark.functions.hashing import portable_hash64

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # cache the tiny distinct key set: it feeds the bit table, the
    # exact-membership broadcast AND the n_build_keys aggregate — one
    # orders scan instead of three (at 100 TB the scan is the cost)
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .cache()
    )

    def bloom_bit(col: F.Column, seed: int) -> F.Column:
        return portable_hash64(col.cast("string"), seed) % BLOOM_BITS

    # all k bits in ONE pass over the key set (explode of a k-array),
    # not a k-way union that re-reads the keys per hash function
    bits = keys.select(
        F.explode(
            F.array(
                *[
                    bloom_bit(F.col("o_custkey"), s)
                    for s in range(BLOOM_HASHES)
                ]
            )
        ).alias("bit")
    ).distinct()

    probe = customer.select("c_custkey")
    for s in range(BLOOM_HASHES):
        probe = probe.withColumn(f"bit{s}", bloom_bit(F.col("c_custkey"), s))
    flagged = probe
    for s in range(BLOOM_HASHES):
        flagged = flagged.join(
            F.broadcast(
                bits.select(
                    F.col("bit").alias(f"bit{s}"),
                    F.lit(1).alias(f"hit{s}"),
                )
            ),
            f"bit{s}",
            "left",
        )
    bloom_pos = (
        sum(F.coalesce(F.col(f"hit{s}"), F.lit(0)) for s in range(BLOOM_HASHES))
        == BLOOM_HASHES
    )
    membered = flagged.join(
        F.broadcast(
            keys.select(
                F.col("o_custkey").alias("c_custkey"),
                F.lit(1).alias("member"),
            )
        ),
        "c_custkey",
        "left",
    ).select(
        bloom_pos.alias("bloom_pos"),
        (F.coalesce(F.col("member"), F.lit(0)) == 1).alias("is_member"),
    )
    probe_summary = membered.agg(
        F.sum(F.when(F.col("bloom_pos"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_positive"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_members"),
        F.sum(
            F.when(F.col("bloom_pos") & ~F.col("is_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_positives"),
    )
    # scalar single-row aggregates join in as broadcast fan-ins — no
    # driver-side count() at plan-build time
    return (
        keys.agg(F.count("*").cast("long").alias("n_build_keys"))
        .crossJoin(bits.agg(F.count("*").cast("long").alias("n_bits_set")))
        .crossJoin(probe_summary)
    )
