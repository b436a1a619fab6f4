"""Physical-plan quality gates — the properties that matter at
100 TB but are invisible in small-scale correctness runs.

- filters reach the parquet scan (PushedFilters)
- projections prune the read schema (ReadSchema)
- dimension joins broadcast (no shuffle of the fact side's keys)
- hot relational paths contain no row-at-a-time Python UDF
"""

from __future__ import annotations

import pytest

from kafkatoclickhouse_spark import plans, registry

# Queries whose hot path must stay entirely JVM-side. (Multimodal /
# minhash paths may use Arrow-batched pandas UDFs — allowed; row-
# at-a-time BatchEvalPython is never allowed anywhere.)
JVM_ONLY = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "join_inner",
    "window_topk_per_group",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_ann_lsh_topk",
    "text_stats",
    "text_quality",
    "asof_join_events",
]


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_row_python_udf_anywhere(spark, sf_dir, name):
    plans.assert_jvm_only(registry.QUERIES[name](spark, sf_dir))


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    plans.assert_pushed_filters(df, "IsNotNull(l_shipdate)", "LessThanOrEqual")


def test_q1_prunes_columns(spark, sf_dir):
    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    schemas = plans.read_schemas(df)
    assert "l_comment" not in schemas, (
        f"q1 reads l_comment — column pruning broken:\n{schemas}"
    )


def test_q3_filters_pushed(spark, sf_dir):
    df = registry.QUERIES["q3_shipping_priority"](spark, sf_dir)
    plans.assert_pushed_filters(df, "o_orderdate", "l_shipdate")


@pytest.mark.parametrize(
    "name", ["q3_shipping_priority", "q5_nation_revenue", "join_inner"]
)
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plans.assert_broadcast_join(registry.QUERIES[name](spark, sf_dir))


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6 is the pushdown showcase: every one of its predicates must
    reach the parquet scan, and only its 4 columns are read."""
    df = registry.QUERIES["q6_forecast_revenue"](spark, sf_dir)
    plans.assert_pushed_filters(
        df,
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThan(l_quantity",
    )
    schemas = plans.read_schemas(df)
    for col in ("l_orderkey", "l_returnflag", "l_partkey"):
        assert col not in schemas, f"q6 reads {col}:\n{schemas}"


def test_filter_predicates_all_pushed(spark, sf_dir):
    df = registry.QUERIES["filter_predicates"](spark, sf_dir)
    plans.assert_pushed_filters(
        df, "In(c_mktsegment", "StringStartsWith(c_name", "c_acctbal"
    )


@pytest.mark.parametrize(
    "name",
    ["q7_nation_volume", "q14_promo_revenue", "q18_large_volume_customer"],
)
def test_tpch_dimension_joins_broadcast(spark, sf_dir, name):
    plans.assert_broadcast_join(registry.QUERIES[name](spark, sf_dir))


@pytest.mark.parametrize(
    "name",
    [
        "q2_min_cost_supplier",
        "q8_market_share",
        "q9_product_profit",
        "q16_supplier_part_counts",
        "q20_dominant_supplier",
        "q21_sole_late_supplier",
    ],
)
def test_tpch2_dimension_joins_broadcast(spark, sf_dir, name):
    plans.assert_broadcast_join(registry.QUERIES[name](spark, sf_dir))


def test_q15_quarter_filter_pushed(spark, sf_dir):
    """Q15's one-quarter shipdate range must reach the lineitem scan
    — at 100 TB this prunes ~96% of a date-partitioned fact table."""
    df = registry.QUERIES["q15_top_supplier"](spark, sf_dir)
    plans.assert_pushed_filters(
        df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"
    )


def test_q12_shipdate_pushed(spark, sf_dir):
    df = registry.QUERIES["q12_priority_class"](spark, sf_dir)
    plans.assert_pushed_filters(
        df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"
    )


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with the same bucket count
    must join with NO Exchange on either side — the pre-shuffle
    pattern that pays the fact-fact shuffle once at write time. The
    joined result must equal the plain (shuffled) join."""
    from pyspark.sql import functions as F

    from kafkatoclickhouse_spark.sources import files
    from kafkatoclickhouse_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    files.write_bucketed(
        li, "li_bucketed", str(tmp_path / "li_b"), ("l_orderkey",), 8
    )
    files.write_bucketed(
        od, "od_bucketed", str(tmp_path / "od_b"), ("o_orderkey",), 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("od_bucketed"),
            F.expr("l_orderkey = o_orderkey"),
        )
        plan = plans.plan_string(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        n_plain = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_minhash_shuffle_is_one_row_per_doc(spark, sf_dir):
    """The minhash signature agg must be partial (map-side combine):
    plan shows a HashAggregate pair around the exchange, so the
    shuffle carries one combined row per doc, not one per shingle."""
    df = registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert plan.count("HashAggregate") >= 2, plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A date-partitioned fact joined to a filtered dimension must
    plan a dynamic-partition-pruning subquery on the fact scan: the
    partitions to read are decided at runtime from the dim's
    surviving keys. At 100 TB this is the difference between
    scanning one month and scanning the whole table."""
    from pyspark.sql import functions as F

    from kafkatoclickhouse_spark.tables import load_table

    od = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    fact_path = str(tmp_path / "orders_by_month")
    od.write.partitionBy("o_month").parquet(fact_path)
    dim_path = str(tmp_path / "months_dim")
    # The dim filter must be on a NON-join column (a filter on the
    # join key itself would propagate statically; a bare boolean
    # attribute is not "likely selective" to the DPP rule).
    od.select("o_month").distinct().withColumn(
        "month_no", F.substring("o_month", 6, 2).cast("int")
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("month_no") == 3)
    joined = fact.join(dim, "o_month").groupBy("o_month").count()
    plan = plans.plan_string(joined)
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning in plan:\n{plan}"
    )
    # and it actually prunes: only the -03 partitions are read.
    months = {r["o_month"] for r in joined.collect()}
    assert months and all(m.endswith("-03") for m in months)


def test_topk_window_prunes_map_side(spark, sf_dir):
    """rank-limit top-k must plan WindowGroupLimit on BOTH sides of
    the exchange: each map task keeps at most k rows per group before
    shuffling, so the exchange carries O(k × groups × tasks) rows —
    not the whole table. This is what makes window top-k viable on a
    100 TB fact table."""
    df = registry.QUERIES["window_topk_per_group"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_sort_limit_is_top_n_not_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    top-N, then merge N×partitions rows on the driver) — never a full
    range-partitioned global sort, which at 100 TB shuffles the whole
    table to answer a 10-row question."""
    df = registry.QUERIES["sort_limit_topn"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_runtime_bloom_filter_on_selective_join(spark, sf_dir):
    """A selective dim filter on a shuffle join must inject a runtime
    bloom filter (or semi-join reduction) on the fact side when the
    broadcast path is disabled: at 100 TB the bloom probe drops
    non-matching fact rows BEFORE the shuffle, which is the whole
    fight. Gates that our plans keep Spark's runtime-filter rule
    reachable (no manual repartition/cache between scan and join)."""
    from pyspark.sql import functions as F

    from kafkatoclickhouse_spark import plans as plans_mod
    from kafkatoclickhouse_spark.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # the rule only fires when the probe side is big enough to be
        # worth filtering (default 10GB) — at fixture scale lower it
        # so the PLAN SHAPE is testable; at 100 TB the default holds.
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = plans_mod.plan_string(joined)
        assert "bloomfilter" in plan.lower().replace("_", ""), (
            f"no runtime bloom filter in plan:\n{plan}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ingest_parses_json_exactly_once(spark, sf_dir):
    """The reference parses each record's JSON 3x; our pipeline must
    parse exactly once. Catalyst's predicate pushdown would inline
    from_json into every pushed validation predicate (recreating the
    triple parse) without the non-deterministic parse-nonce barrier
    in ingest.parse_and_enrich — this pins both the barrier and the
    flagship's HashAggregate (string min/max would silently fall back
    to Sort+SortAggregate)."""
    plan = plans.plan_string(
        registry.QUERIES["ingest_keyed_counts"](spark, sf_dir)
    )
    assert plan.count("from_json") == 1, plan
    assert "HashAggregate" in plan and "SortAggregate" not in plan, plan


@pytest.mark.parametrize(
    "name", ["events_funnel_steps", "corpus_prep_pipeline"]
)
def test_single_exchange_pipelines(spark, sf_dir, name):
    """Queries whose docstrings promise ONE shuffle must keep that
    promise: the funnel's three chained window-mins + final agg share
    a single user_id hash partitioning, and the corpus prep manifest
    (score → filter → dedup → sample → count) shuffles only for the
    dedup fingerprint window. A second Exchange appearing here means
    a partitioning stopped being reused."""
    plan = plans.plan_string(registry.QUERIES[name](spark, sf_dir), "simple")
    n = plan.count("Exchange")
    assert n == 1, f"{name}: expected 1 Exchange, found {n}\n{plan}"


def test_ngram_hot_shingle_anti_join_is_broadcast(spark, sf_dir):
    """The frequency cap's hot-shingle exclusion must plan as a
    BROADCAST left-anti join: the hot list is tiny by construction
    (≤ shingles/cap entries), and a shuffled anti-join would add a
    full shingle-keyed exchange — at 100 TB, the dominant cost of
    the exact path. The candidate join itself still shuffles on
    shingle, as it must."""
    df = registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_decontaminate_eval_join_is_broadcast(spark, sf_dir):
    """The decontamination overlap join must BROADCAST the eval
    shingle set: benchmarks are MBs while the training corpus is TBs,
    so a shuffled join here would hash-exchange every training
    shingle — the exact cost the operator's design avoids. The only
    Exchange allowed on the training side is the final doc_id count."""
    df = registry.QUERIES["text_decontaminate"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmeans_assignment_is_pure_map(spark, sf_dir):
    """k-means cell assignment must be a MAP stage: the centroid
    table rides in the plan as a literal (K·DIM int64, kilobytes),
    so the argmin needs no join, no window, and no exchange of the
    vector table. The first cut paired vectors with centroids via
    crossJoin + row_number, which re-shuffled n×K rows per Lloyd
    round — this gate pins the rewrite. (The only Exchange allowed
    is fan_out's input-layout repartition, local-fixture-only.)"""
    df = registry.QUERIES["embedding_kmeans_assign"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_pq_serve_scan_is_codes_only_and_fused(spark, sf_dir):
    """The persisted-index serve plan must be the 100 TB retrieval
    shape (r15 fused form): ONE scan — the compressed codes artifact
    — feeding the fused MapInArrow scorer; never a cartesian/nested-
    loop pairing, and the embeddings table must not appear in the
    retrieval plan at all (its Q query vectors are collected
    pre-plan; the codes scan carries no vector column by
    construction)."""
    df = registry.QUERIES["sim_ivfpq_serve_topk"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "MapInArrow" in plan, plan
    assert "embeddings.parquet" not in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_pq_refine_is_single_scan_no_hydrate_join(spark, sf_dir):
    """The refine tier's exact re-rank must NOT re-scan the corpus:
    the r15 fused kernel rescoring each batch's over-fetched
    candidates in place means the plan has exactly ONE corpus scan,
    no join of any kind, and both the over-fetch and the final
    re-rank are windows over a single query_id exchange."""
    df = registry.QUERIES["sim_pq_refine_topk"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "Join" not in plan, plan
    assert "MapInArrow" in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert plan.count("Exchange hashpartitioning(query_id") == 1, plan


def test_bm25_topk_is_takeordered_with_broadcast_query(spark, sf_dir):
    """BM25's final top-k must be a TakeOrderedAndProject (no global
    sort / no unpartitioned window over the scored doc set — the
    only Window allowed is the rank stamp over the BM25_TOP result
    rows), and the 5-row query-term table must join by broadcast."""
    df = registry.QUERIES["text_bm25_topk"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Window [") == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bucketed_embedding_dedup_never_cartesian(spark, sf_dir):
    """The adaptive banded-LSH dedup must pair candidates through an
    equi-join on (band_id, band_bits) — a CartesianProduct or
    BroadcastNestedLoopJoin in this plan means the all-pairs path
    leaked back in, which is exactly what the operator exists to
    avoid at 100 TB."""
    df = registry.QUERIES["dedup_embedding_cosine_bucketed"](spark, sf_dir)
    plan = plans.plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_aqe_skew_join_splits_skewed_partition(spark, sf_dir):
    """VERDICT r8 #5: `join_salted_skew` proves MANUAL salting; at
    100× you also want evidence Spark's own adaptive skew-join fires.
    Build a join where one key holds ~half the fact rows (synthetic
    range — the driver fixture is below the skew detector's floor
    even with minimum thresholds), lower the AQE skew thresholds to
    local scale, and assert the EXECUTED plan's sort-merge join
    carries the skew=true marker (AQE split the oversized partition
    into parallel sub-reads).

    When does manual salting still win? (1) broadcast-ineligible
    AGGREGATIONS (AQE skew handling covers joins, not groupBy — the
    two-phase salted agg `agg_salted_two_phase` stays the fix there);
    (2) skewed keys on BOTH sides (AQE splits one side's partition
    and replicates the other's matching partition wholesale — if that
    side is itself huge, salting bounds the replication explicitly);
    (3) engines/configs without AQE. Otherwise prefer the built-in:
    it needs no key rewrite and adapts per-batch."""
    from pyspark.sql import functions as F

    from kafkatoclickhouse_spark import plans

    prev = {}
    tune = {
        # force SMJ (no broadcast escape hatch) and make the skew
        # detector fire at local scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": (
            "64KB"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    for k, v in tune.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        fact = spark.range(400_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") % 100).alias("val"),
        )
        dim = spark.range(400_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = fact.join(dim, "k").groupBy().agg(
            F.sum("val").alias("s"), F.count("*").alias("n")
        )
        [row] = joined.collect()  # materialize → AQE finalizes
        final = plans.executed_plan_string(joined)
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, (
            "AQE did not mark the skewed join:\n" + final
        )
        # and the result is still exactly the unskewed semantics:
        # every even id joins key 1 (hits dim once), odd ids hit once
        n_even = 200_000
        n_odd = 200_000
        assert row["n"] == n_even + n_odd
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    [
        "corpus_pack_chunks",
        "corpus_pack_chunks_bpe",
        "corpus_pack_chunks_bpe_trained",
        "corpus_pack_examples",
        "corpus_pack_examples_spans",
        "corpus_epoch_order",
    ],
)
def test_pack_family_has_no_unpartitioned_window(spark, sf_dir, name):
    """VERDICT r13 #2: the pack family's global prefix sum must not
    plan ANY unpartitioned window ('WindowExec: No Partition Defined
    ... Moving all data to a single partition') — the old two-phase
    shape ran its second phase as a single-task sort over
    n_docs/PREFIX_BUCKET bucket totals, a ceiling at ~100 B docs.
    After `exclusive_bucket_prefix`, every windowspecdefinition must
    carry at least one partition column (the first spec element is a
    bare column, not an ordering)."""
    import re

    plan = plans.plan_string(
        registry.QUERIES[name](spark, sf_dir), "simple"
    )
    offenders = [
        m.group(0)
        for m in re.finditer(r"windowspecdefinition\([^,)]+,", plan)
        if re.match(
            r"windowspecdefinition\([^,()]*(ASC|DESC)", m.group(0)
        )
    ]
    assert not offenders, f"{name}: unpartitioned window(s): {offenders}"
