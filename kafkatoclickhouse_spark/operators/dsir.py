"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023). [EXT] LLM-pipeline surface (SURVEY.md §2.2).

The published recipe for "make the pretraining mix look like a
target domain": fit two bag-of-hashed-n-gram generative models — one
on a TARGET sample (the domain you want more of: wiki/books/eval-
adjacent text), one on the RAW pool — score every raw document with
the importance log-weight

    log w(d) = Σ_grams  ln p̂_target(bucket) − ln p̂_raw(bucket)

and resample the pool with Gumbel top-k on the perturbed weights
(sampling without replacement ∝ w — Gumbel-max is the standard
trick, and makes selection a plain top-k).

Engine mapping (everything integer-exact and oracle-replayable):

  - features: unigrams + bigrams of the lowercased whitespace
    tokenization, hashed to ``DSIR_BUCKETS`` buckets
    (``functions.hashing.portable_hash64`` — the md5 family every
    oracle replays; swap for xxhash64 at 100 TB);
  - the two models' add-one-smoothed log-ratio per bucket is the
    SAME integer micro-nat LLR the trained NB classifier uses
    (λ(b) = ln((c_t+1)/(T_t+B) · (T_r+B)/(c_r+1)), floor(x·1e6+0.5))
    — so document log-weights are exact BIGINT sums;
  - Gumbel noise is DERIVED (hash of doc_id → uniform in (0,1) →
    −ln(−ln u), micro-quantized): deterministic across runs,
    engines, and partitionings — reproducible sampling;
  - selection is top-k of (logw_micro + gumbel_micro) with doc_id
    tie-break — ``TakeOrderedAndProject`` in Spark (per-partition
    top-k, merge on the driver: no global sort at any scale).

Shuffle shape at 100 TB: model fitting is ONE bucket-keyed aggregate
(map-side combined, ≤ DSIR_BUCKETS output rows) over the gram
explode; totals ride a broadcast scalar; scoring is explode →
broadcast λ-table join → one doc_id aggregate; selection is a
per-partition top-k. Linear everywhere; the only driver barrier is
the bounded raw-pool count that fixes k (the kmeans-Lloyd pattern).

Reference basis: the reference repo (Flink→ClickHouse, 328 LoC) has
no selection surface; this is north-star [EXT] scope per
BASELINE.json, built from the public paper only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions import hashing
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

DSIR_SEED = 401          # gram → bucket hash seed
DSIR_GUMBEL_SEED = 403   # doc_id → uniform hash seed
DSIR_BUCKETS = 4096
DSIR_SELECT_DIV = 4      # k = n_raw // 4 (resample a quarter of the pool)

# The registered queries' target domain: two fixture sources stand in
# for "the high-quality domain sample" (wiki/books in the paper).
DSIR_TARGET_SOURCES = ("src0", "src1")


def _sql_target_pred(src_expr: str = "source") -> str:
    lst = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)
    return f"{src_expr} IN ({lst})"


def _llr_micro_col(
    c_t: Column, c_r: Column, t_t: Column, t_r: Column
) -> Column:
    """Integer micro-nat smoothed log-ratio — literal op order shared
    with :func:`_sql_llr_micro` (same 1-ULP libm caveat as
    text_unigram_logperp / the NB classifier)."""
    return (
        F.floor(
            F.log(
                (c_t + F.lit(1)).cast("double")
                / (t_t + F.lit(DSIR_BUCKETS)).cast("double")
                * (
                    (t_r + F.lit(DSIR_BUCKETS)).cast("double")
                    / (c_r + F.lit(1)).cast("double")
                )
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
    )


def _sql_llr_micro(ct: str, cr: str, tt: str, tr: str) -> str:
    b = DSIR_BUCKETS
    return (
        f"CAST(FLOOR(ln(CAST({ct} + 1 AS DOUBLE)"
        f" / CAST({tt} + {b} AS DOUBLE)"
        f" * (CAST({tr} + {b} AS DOUBLE)"
        f" / CAST({cr} + 1 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)"
    )


def _gumbel_micro_col(doc_id: Column) -> Column:
    """Derived Gumbel(0,1) noise in integer micro-units:
    u = (hash(doc_id) % 1e6 + 0.5)/1e6 ∈ (0,1), g = −ln(−ln u)."""
    u = (
        (
            hashing.portable_hash64(
                doc_id.cast("string"), DSIR_GUMBEL_SEED
            )
            % F.lit(1000000)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return (
        F.floor(-F.log(-F.log(u)) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
    )


def _sql_gumbel_micro(doc_expr: str) -> str:
    h = hashing.sql_portable_hash64(
        f"CAST({doc_expr} AS VARCHAR)", DSIR_GUMBEL_SEED
    )
    u = f"((CAST({h} % 1000000 AS DOUBLE) + 0.5) / 1000000.0)"
    return f"CAST(FLOOR(-ln(-ln({u})) * 1000000 + 0.5) AS BIGINT)"


def _grams_df(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bucket) per hashed-n-gram OCCURRENCE
    (unigrams + bigrams of the lowercased whitespace tokens)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    with_toks = docs.select("doc_id", "source", toks.alias("ts"))
    uni = with_toks.select(
        "doc_id", "source", F.explode(F.col("ts")).alias("gram")
    )
    bi = with_toks.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size(F.col("ts")) >= 2,
                F.transform(
                    F.slice(F.col("ts"), 1, F.size(F.col("ts")) - 1),
                    lambda t, i: F.concat(
                        t, F.lit(" "), F.element_at(F.col("ts"), i + 2)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    return uni.unionByName(bi).select(
        "doc_id",
        "source",
        (
            hashing.portable_hash64(F.col("gram"), DSIR_SEED)
            % F.lit(DSIR_BUCKETS)
        ).alias("bucket"),
    )


def _sql_grams_ctes() -> str:
    """DuckDB CTE chain (no WITH prefix): ``gb`` = (doc_id, source,
    bucket) per gram occurrence — the SQL twin of :func:`_grams_df`."""
    bucket = (
        hashing.sql_portable_hash64("gram", DSIR_SEED)
        + f" % {DSIR_BUCKETS}"
    )
    return f"""
    dtoks AS (SELECT doc_id, source,
                     list_filter(string_split_regex(lower(trim(text)),
                                                    '\\s+'),
                                 t -> t <> '') AS ts
              FROM documents),
    grams AS (
      SELECT doc_id, source, unnest(ts) AS gram FROM dtoks
      UNION ALL
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(ts)),
                                   i -> ts[i] || ' ' || ts[i + 1]))
               AS gram
      FROM dtoks
    ),
    gb AS (SELECT doc_id, source, {bucket} AS bucket FROM grams)
    """


def dsir_logweights(docs: DataFrame, target_pred: Column) -> DataFrame:
    """(doc_id, source, logw_micro) for every RAW-pool document
    (``NOT target_pred``): fit both hashed-n-gram models over the
    given corpus and score the pool with the integer micro-nat
    importance log-weight. The λ table is ≤ DSIR_BUCKETS rows and
    broadcast; docs with no tokens score 0 (both models agree)."""
    # r14: the model fit is a ≤ DSIR_BUCKETS-row aggregate, so it is
    # collected ONCE as a bounded driver barrier (the classifier /
    # kmeans pattern) instead of recomputing the whole tokenize +
    # explode + md5 gram pipeline for the λ table AND AGAIN for its
    # totals — the old tot-crossJoin-counts shape cost a third full
    # corpus pass because Spark's exchange reuse does not fire across
    # those branch shapes (verified on the executed plan: 37
    # exchanges, 2 reused). Totals are integer sums (exact in
    # Python); λ itself is still computed BY SPARK on the collected
    # integers so the ln() floats stay bit-identical to the oracle's.
    # one tokenize+hash pass total: the per-(doc,bucket) histogram is
    # localCheckpoint-ed (executor memory/disk, ≤ DSIR_BUCKETS rows
    # per doc, recomputed on every invocation — no cross-run state)
    # and feeds BOTH the collected model fit and the scoring join;
    # measured 2.30 → 1.78 s vs re-running the gram pipeline twice
    hist = (
        _grams_df(docs)
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("k"))
        .withColumn("is_t", target_pred)
        .localCheckpoint()
    )
    counts_pdf = (
        hist.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_t"), F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("c_t"),
            F.sum(F.when(~F.col("is_t"), F.col("k")).otherwise(F.lit(0)))
            .cast("long")
            .alias("c_r"),
        )
        .toPandas()
    )
    t_t = int(counts_pdf["c_t"].sum())
    t_r = int(counts_pdf["c_r"].sum())
    spark = docs.sparkSession
    lam = spark.createDataFrame(
        counts_pdf, schema="bucket long, c_t long, c_r long"
    ).select(
        "bucket",
        _llr_micro_col(
            F.col("c_t"), F.col("c_r"), F.lit(t_t), F.lit(t_r)
        ).alias("lam_micro"),
    )
    raw_hist = hist.filter(~F.col("is_t")).select(
        "doc_id", "bucket", "k"
    )
    persum = (
        raw_hist.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("k") * F.col("lam_micro"))
            .cast("long")
            .alias("s")
        )
    )
    pool = docs.filter(~target_pred).select("doc_id", "source")
    return pool.join(persum, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("logw_micro"),
    )


def _sql_weights_ctes() -> str:
    """CTE chain ending in ``dw`` = (doc_id, source, logw_micro) over
    the raw pool — the oracle twin of :func:`dsir_logweights` with
    the registered queries' target predicate."""
    tpred = _sql_target_pred()
    return f"""
    {_sql_grams_ctes()},
    counts AS (SELECT bucket,
                 CAST(SUM(CASE WHEN {tpred} THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_t,
                 CAST(SUM(CASE WHEN {tpred} THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_r
               FROM gb GROUP BY bucket),
    tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t_t,
                   CAST(SUM(c_r) AS BIGINT) AS t_r FROM counts),
    lam AS (SELECT bucket,
              {_sql_llr_micro("c_t", "c_r", "t_t", "t_r")} AS lam_micro
            FROM counts CROSS JOIN tot),
    persum AS (SELECT gb.doc_id, CAST(SUM(l.lam_micro) AS BIGINT) AS s
               FROM gb JOIN lam l USING (bucket)
               WHERE NOT ({_sql_target_pred("gb.source")})
               GROUP BY gb.doc_id),
    dw AS (SELECT d.doc_id, d.source,
                  CAST(COALESCE(p.s, 0) AS BIGINT) AS logw_micro
           FROM documents d LEFT JOIN persum p USING (doc_id)
           WHERE NOT ({_sql_target_pred("d.source")}))
    """


@query(
    "corpus_dsir_weights",
    oracle=f"""
    WITH {_sql_weights_ctes()}
    SELECT doc_id, source, logw_micro FROM dw
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight over the raw pool
    (every source outside the target domain): exact BIGINT micro-nat
    sum of the per-bucket smoothed target/raw log-ratios. One bucket
    aggregate to fit both models, one broadcast join + doc aggregate
    to score — the oracle refits the identical models from raw
    text."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return dsir_logweights(
        docs, F.col("source").isin(*DSIR_TARGET_SOURCES)
    )


def dsir_select(docs: DataFrame, target_pred: Column, k: int) -> DataFrame:
    """Gumbel top-k importance resample of the raw pool: top ``k``
    documents by (logw_micro + gumbel_micro) with doc_id tie-break.
    TakeOrderedAndProject — no global sort."""
    w = dsir_logweights(docs, target_pred)
    keyed = w.select(
        "doc_id",
        "source",
        "logw_micro",
        (F.col("logw_micro") + _gumbel_micro_col(F.col("doc_id")))
        .cast("long")
        .alias("key_micro"),
    )
    return keyed.orderBy(
        F.col("key_micro").desc(), F.col("doc_id").asc()
    ).limit(k)


@query(
    "corpus_dsir_select",
    oracle=f"""
    WITH {_sql_weights_ctes()},
    keyed AS (SELECT doc_id, source, logw_micro,
                CAST(logw_micro + {_sql_gumbel_micro("doc_id")}
                     AS BIGINT) AS key_micro
              FROM dw),
    ranked AS (SELECT *, ROW_NUMBER() OVER
                 (ORDER BY key_micro DESC, doc_id ASC) AS rn
               FROM keyed)
    SELECT doc_id, source, logw_micro, key_micro
    FROM ranked
    WHERE rn <= (SELECT COUNT(*) // {DSIR_SELECT_DIV} FROM dw)
    """,
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: Gumbel top-k resample of the raw pool toward
    the target domain, k = pool_size // {DSIR_SELECT_DIV}. The Gumbel
    perturbation is hash-derived and micro-quantized, so the sampled
    SET is deterministic across runs/engines/partitionings — the
    reproducibility a 100 TB selection job needs. The pool count that
    fixes k is the one bounded driver barrier."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tpred = F.col("source").isin(*DSIR_TARGET_SOURCES)
    # the k-fixing count barrier reads the un-fanned scan: a COUNT
    # over one narrow column gains nothing from the repartition and
    # would otherwise pay its exchange
    n_raw = (
        load_table(spark, sf_dir, "documents").filter(~tpred).count()
    )
    return dsir_select(docs, tpred, max(n_raw // DSIR_SELECT_DIV, 1))


@query(
    "corpus_dsir_coverage",
    oracle=f"""
    WITH {_sql_weights_ctes()},
    keyed AS (SELECT doc_id, source, logw_micro,
                CAST(logw_micro + {_sql_gumbel_micro("doc_id")}
                     AS BIGINT) AS key_micro
              FROM dw),
    ranked AS (SELECT *, ROW_NUMBER() OVER
                 (ORDER BY key_micro DESC, doc_id ASC) AS rn
               FROM keyed),
    sel AS (SELECT doc_id FROM ranked
            WHERE rn <= (SELECT COUNT(*) // {DSIR_SELECT_DIV} FROM dw))
    SELECT dw.source,
           CAST(COUNT(*) AS BIGINT) AS n_pool,
           CAST(SUM(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS sel_ppm
    FROM dw LEFT JOIN sel USING (doc_id)
    GROUP BY dw.source
    """,
)
def corpus_dsir_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DSIR selection report — pool size, selected count
    and exact integer selection rate (ppm): the diagnostic that shows
    WHICH pool sources the resample shifts toward the target domain
    (sources writing target-like grams get high λ sums and dominate).
    Same plan as the selection plus one source-keyed count."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tpred = F.col("source").isin(*DSIR_TARGET_SOURCES)
    # the k-fixing count barrier reads the un-fanned scan: a COUNT
    # over one narrow column gains nothing from the repartition and
    # would otherwise pay its exchange
    n_raw = (
        load_table(spark, sf_dir, "documents").filter(~tpred).count()
    )
    sel = dsir_select(
        docs, tpred, max(n_raw // DSIR_SELECT_DIV, 1)
    ).select("doc_id", F.lit(1).alias("hit"))
    pool = dsir_logweights(docs, tpred)
    return (
        pool.join(sel, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_pool"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("long"))
            .cast("long")
            .alias("n_selected"),
            F.expr(
                "CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END)"
                " * 1000000 DIV count(*) AS LONG)"
            ).alias("sel_ppm"),
        )
    )
