"""Domain-mixture sampling — deterministic data mixing over the
``documents`` corpus. [EXT] LLM-pipeline surface (SURVEY.md §2.2);
the reference has no corpus operators.

Training-data pipelines rarely consume a crawl as-is: they re-weight
domains/sources toward a target mixture (DoReMi, The Pile's per-set
epochs, Llama's sampling proportions are all published instances of
this shape). The operator here is the batch form: given per-source
target shares and a total token/document budget, select a
reproducible subset whose per-source counts hit the integer quotas.

Determinism contract — everything is integer math, so the DuckDB
oracle replays it exactly:

  - budget   = floor(total_docs · MIX_BUDGET_NUM / MIX_BUDGET_DEN)
    as one integer floor-division;
  - target share of source with name-rank r (1-based ascending) is
    r / Σr — deliberately skewed so the quota math is exercised;
    quota_raw = (r · budget) // Σr, again pure integers;
  - quota = min(quota_raw, n_docs): an under-populated source caps
    at its population and the report shows the shortfall (a real
    mixer would upsample/epoch-repeat; selection here never
    duplicates rows);
  - WHICH documents fill a quota: the quota lowest by the portable
    md5 hash of (source, doc_id) — a frozen pseudo-random order, so
    the sample is unbiased w.r.t. document order yet bit-stable
    across engines, partitionings, and reruns.

Scale notes (100 TB): the quota table is |sources| rows — broadcast.
The only data-scale shuffle is the per-source ``row_number`` window
(hash-ordered rank within source); a skew-hot source is the usual
salt-or-split candidate, and at extreme scale the exact-rank window
relaxes to a hash-threshold filter (accept h < cutoff estimated from
the quota/population ratio) which needs NO window at all — the exact
path is kept here because it is quota-exact and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions import hashing
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

MIX_SEED = 77
# budget = 4/5 of the corpus — high enough that top-ranked sources'
# raw quotas exceed their populations on the uniform fixture, so the
# cap/shortfall branch is exercised, not just compiled.
MIX_BUDGET_NUM = 4
MIX_BUDGET_DEN = 5


def _quotas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, rank, share_micro, quota_raw, quota) — one
    row per source, all integer-exact. Unpartitioned windows here run
    over the |sources|-row AGGREGATE (bounded — same class as the
    documented top-k window sites), never over document rows."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w_rank = W.orderBy("source")
    w_all = W.partitionBy()
    ranked = (
        counts.withColumn("rank", F.row_number().over(w_rank))
        .withColumn("total", F.sum("n_docs").over(w_all))
        .withColumn("sumrank", F.sum("rank").over(w_all))
    )
    budget = (
        F.col("total") * F.lit(MIX_BUDGET_NUM)
    ) / F.lit(MIX_BUDGET_DEN)
    quota_raw = F.floor(
        F.floor(budget) * F.col("rank") / F.col("sumrank")
    ).cast("long")
    return ranked.select(
        "source",
        "n_docs",
        "rank",
        F.floor(
            F.col("rank") * F.lit(1000000) / F.col("sumrank")
        ).cast("long").alias("share_micro"),
        quota_raw.alias("quota_raw"),
        F.least(quota_raw, F.col("n_docs")).alias("quota"),
    )


_SQL_QUOTAS = f"""
    counts AS (SELECT source, COUNT(*) AS n_docs
               FROM documents GROUP BY source),
    ranked AS (SELECT source, n_docs,
                      ROW_NUMBER() OVER (ORDER BY source) AS rank,
                      SUM(n_docs) OVER () AS total
               FROM counts),
    qt AS (SELECT source, n_docs, rank,
                  CAST(FLOOR(rank * 1000000.0
                             / (SUM(rank) OVER ())) AS BIGINT)
                    AS share_micro,
                  CAST(FLOOR(FLOOR(total * {MIX_BUDGET_NUM}.0
                                   / {MIX_BUDGET_DEN})
                             * rank / (SUM(rank) OVER ()))
                       AS BIGINT) AS quota_raw
           FROM ranked)
"""


@query(
    "corpus_mixture_report",
    oracle=f"""
    WITH {_SQL_QUOTAS}
    SELECT source, n_docs, CAST(rank AS INTEGER) AS rank,
           share_micro, quota_raw,
           LEAST(quota_raw, n_docs) AS quota,
           GREATEST(quota_raw - n_docs, 0) AS shortfall
    FROM qt
    """,
)
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture plan: population, name-rank, integer-micro
    target share, raw and capped quota, and the shortfall an
    under-populated source leaves on the table — the artifact a
    mixture tuner (or an upsampling pass) consumes."""
    return _quotas(spark, sf_dir).select(
        "source",
        "n_docs",
        "rank",
        "share_micro",
        "quota_raw",
        "quota",
        F.greatest(
            F.col("quota_raw") - F.col("n_docs"), F.lit(0)
        ).cast("long").alias("shortfall"),
    )


@query(
    "corpus_mixture_sample",
    oracle=f"""
    WITH {_SQL_QUOTAS},
    hashed AS (
      SELECT d.doc_id, d.source,
             {hashing.sql_portable_hash64(
                 "d.source || ':' || CAST(d.doc_id AS VARCHAR)",
                 MIX_SEED,
             )} AS h
      FROM documents d
    ),
    picked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY h, doc_id) AS pick_rank
      FROM hashed
    )
    SELECT p.doc_id, p.source, CAST(p.pick_rank AS INTEGER) AS pick_rank
    FROM picked p
    JOIN qt ON qt.source = p.source
    WHERE p.pick_rank <= LEAST(qt.quota_raw, qt.n_docs)
    """,
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selected subset itself: per source, the quota documents
    lowest by frozen hash order — (doc_id, source, pick_rank). The
    quota table broadcasts; the document side pays one per-source
    rank window (the exact path — see module docstring for the
    windowless hash-threshold relaxation at extreme scale)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hashed = docs.select(
        "doc_id",
        "source",
        hashing.portable_hash64(
            F.concat_ws(":", F.col("source"), F.col("doc_id")),
            MIX_SEED,
        ).alias("h"),
    )
    w = W.partitionBy("source").orderBy("h", "doc_id")
    picked = hashed.withColumn("pick_rank", F.row_number().over(w))
    quotas = _quotas(spark, sf_dir).select("source", "quota")
    return (
        picked.join(F.broadcast(quotas), "source")
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select("doc_id", "source", "pick_rank")
    )


@query(
    "corpus_mixture_sample_hashgate",
    oracle=f"""
    WITH {_SQL_QUOTAS},
    gate AS (SELECT source, n_docs,
                    LEAST(CAST(FLOOR(quota_raw * 1000000.0 / n_docs)
                               AS BIGINT), 1000000) AS accept_ppm
             FROM qt),
    hashed AS (
      SELECT d.doc_id, d.source,
             {hashing.sql_portable_hash64(
                 "d.source || ':' || CAST(d.doc_id AS VARCHAR)",
                 MIX_SEED,
             )} % 1000000 AS hmod
      FROM documents d
    )
    SELECT h.doc_id, h.source
    FROM hashed h JOIN gate g ON g.source = h.source
    WHERE h.hmod < g.accept_ppm
    """,
)
def corpus_mixture_sample_hashgate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The windowless extreme-scale relaxation the module docstring
    promises: accept a document iff its frozen hash mod 1e6 falls
    under the source's acceptance rate (quota/population in ppm).
    NO window, NO per-source sort — one map-side predicate against
    a broadcast |sources|-row gate table, so at 100 TB this is a
    single scan with zero data-scale shuffle. The price: per-source
    counts land NEAR the quota (binomial around rate·n) instead of
    exactly on it; the exact-rank twin above is the quota-exact
    path. Selection is still bit-stable — both engines evaluate the
    same integer predicate."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hashed = docs.select(
        "doc_id",
        "source",
        (
            hashing.portable_hash64(
                F.concat_ws(":", F.col("source"), F.col("doc_id")),
                MIX_SEED,
            )
            % F.lit(1000000)
        ).alias("hmod"),
    )
    gate = _quotas(spark, sf_dir).select(
        "source",
        F.least(
            F.floor(
                F.col("quota_raw") * F.lit(1000000) / F.col("n_docs")
            ).cast("long"),
            F.lit(1000000).cast("long"),
        ).alias("accept_ppm"),
    )
    return (
        hashed.join(F.broadcast(gate), "source")
        .filter(F.col("hmod") < F.col("accept_ppm"))
        .select("doc_id", "source")
    )


@query(
    "corpus_mixture_upsample",
    oracle=f"""
    WITH {_SQL_QUOTAS},
    hashed AS (
      SELECT d.doc_id, d.source,
             {hashing.sql_portable_hash64(
                 "d.source || ':' || CAST(d.doc_id AS VARCHAR)",
                 MIX_SEED,
             )} AS h
      FROM documents d
    ),
    picked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY h, doc_id) AS pick_rank
      FROM hashed
    ),
    reps AS (
      SELECT p.doc_id, p.source,
             (qt.quota_raw // qt.n_docs)
             + CASE WHEN p.pick_rank <= qt.quota_raw % qt.n_docs
                    THEN 1 ELSE 0 END AS n_epochs
      FROM picked p JOIN qt ON qt.source = p.source
    )
    SELECT doc_id, source, CAST(e.epoch AS INTEGER) AS epoch
    FROM reps, LATERAL (SELECT unnest(range(n_epochs)) AS epoch) e
    WHERE n_epochs > 0
    """,
)
def corpus_mixture_upsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shortfall repair by epoch repetition — the other half of a
    real mixer (DoReMi-style reweighting UPsamples rare domains; the
    capped sampler above can only trim). Every source emits EXACTLY
    quota_raw rows: each document repeats floor(quota_raw/n_docs)
    times and the remainder goes to the quota_raw % n_docs documents
    lowest in the frozen hash order, tagged with an epoch index so a
    trainer can interleave repeats. Row explosion happens executor-
    side via sequence+explode against broadcast per-source epoch
    counts — no driver loop, no shuffle beyond the rank window
    shared with the exact sampler."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hashed = docs.select(
        "doc_id",
        "source",
        hashing.portable_hash64(
            F.concat_ws(":", F.col("source"), F.col("doc_id")),
            MIX_SEED,
        ).alias("h"),
    )
    w = W.partitionBy("source").orderBy("h", "doc_id")
    picked = hashed.withColumn("pick_rank", F.row_number().over(w))
    quotas = _quotas(spark, sf_dir).select(
        "source", "quota_raw", "n_docs"
    )
    n_epochs = (
        # integer `div`, not floor(double /): the oracle uses '//' and
        # double division loses bit-exactness past 2^53-scale products
        F.expr("quota_raw div n_docs").cast("long")
        + F.when(
            F.col("pick_rank")
            <= F.col("quota_raw") % F.col("n_docs"),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return (
        picked.join(F.broadcast(quotas), "source")
        .withColumn("n_epochs", n_epochs)
        .filter(F.col("n_epochs") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(
                    F.lit(0), (F.col("n_epochs") - 1).cast("int")
                )
            ).alias("epoch"),
        )
    )
