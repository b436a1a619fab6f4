"""Hashing-trick linear text classifier — model-based quality
filtering plumbing. [EXT] LLM-pipeline surface (SURVEY.md §2.2).

Production corpora are filtered by trained linear classifiers over
hashed bag-of-words features (the fastText-style quality/toxicity
gates in published pipeline reports: a vocabulary-free feature
hasher, a weight per bucket, a dot product, a threshold). This
module implements that scoring path exactly, with one substitution:
because no trained weights ship with this repo, the per-bucket
weight is DERIVED from the bucket id by the portable hash — a
frozen, engine-replayable stand-in with the same range and the same
plan shape. Swapping in a real model is a one-line change: replace
the derived weight expression with a lookup against a broadcast
(bucket → weight) table — same hashing, same aggregation, plus one
broadcast join.

Scoring is a PURE MAP: tokenize → hash to ``CLF_BUCKETS`` buckets →
weight → sum. No shuffle, no join, no Python — at 100 TB the
classifier runs inside the scan's whole-stage codegen and costs two
md5 evaluations per token. All arithmetic is integer micro-units, so
the DuckDB oracle replays logits bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions import hashing
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

CLF_SEED = 311          # token → bucket hash seed
CLF_WEIGHT_SEED = 313   # bucket → weight hash seed
CLF_BUCKETS = 4096
CLF_WEIGHT_SPAN = 1000  # weights span [-1000, +1000] micro-units


def _sql_weight_expr() -> str:
    """DuckDB twin of :func:`_weight_col` over lambda var ``t``."""
    bucket = (
        hashing.sql_portable_hash64("t", CLF_SEED) + f" % {CLF_BUCKETS}"
    )
    return (
        hashing.sql_portable_hash64(
            f"CAST(({bucket}) AS VARCHAR)", CLF_WEIGHT_SEED
        )
        + f" % {2 * CLF_WEIGHT_SPAN + 1} - {CLF_WEIGHT_SPAN}"
    )


@query(
    "text_classifier_score",
    oracle=f"""
    SELECT doc_id,
           CAST(COALESCE(list_aggregate(list_transform(
               list_filter(string_split_regex(lower(trim(text)),
                                              '\\s+'),
                           t -> t <> ''),
               t -> {_sql_weight_expr()}), 'sum'), 0) AS BIGINT)
             AS logit_micro,
           CAST(COALESCE(list_aggregate(list_transform(
               list_filter(string_split_regex(lower(trim(text)),
                                              '\\s+'),
                           t -> t <> ''),
               t -> {_sql_weight_expr()}), 'sum'), 0) AS BIGINT)
             >= 0 AS keep
    FROM documents
    """,
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document classifier verdict: the integer logit (sum of
    hashed-bucket micro-weights over the lowercased whitespace bag
    of words, empty documents scoring the bias 0) and the keep flag
    at threshold 0. Bit-exact across engines; the plan has no
    key shuffle — the only exchange is the fixture fan-out's
    round-robin split guard (tables.fan_out), absent on real
    many-split layouts."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    logit = F.aggregate(
        F.transform(toks, lambda t: _weight_col(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        logit.alias("logit_micro"),
        (logit >= 0).alias("keep"),
    )


def _weight_col(t: Column) -> Column:
    """Column twin of :func:`_weight_expr` for higher-order lambdas
    (the SQL-string form can't capture a lambda variable)."""
    bucket = hashing.portable_hash64(t, CLF_SEED) % F.lit(CLF_BUCKETS)
    return (
        hashing.portable_hash64(
            bucket.cast("string"), CLF_WEIGHT_SEED
        )
        % F.lit(2 * CLF_WEIGHT_SPAN + 1)
        - F.lit(CLF_WEIGHT_SPAN)
    )


@query(
    "text_classifier_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(COALESCE(list_aggregate(list_transform(
                 list_filter(string_split_regex(lower(trim(text)),
                                                '\\s+'),
                             t -> t <> ''),
                 t -> {_sql_weight_expr()}), 'sum'), 0) AS BIGINT)
               AS logit_micro
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN logit_micro >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
           CAST(FLOOR(AVG(logit_micro)) AS BIGINT)
             AS mean_logit_micro_floor
    FROM scored GROUP BY source
    """,
)
def text_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source keep-rate and mean-logit report — the calibration
    surface a filtering run is monitored by (a source whose keep
    rate collapses signals domain shift against the classifier).
    Floor-of-mean keeps the aggregate on the integer grid. One
    map + one partial-aggregated groupBy at any scale."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    logit = F.aggregate(
        F.transform(toks, lambda t: _weight_col(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        docs.select("source", logit.alias("logit_micro"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("logit_micro") >= 0).cast("long")
            ).alias("n_keep"),
            F.floor(F.avg("logit_micro"))
            .cast("long")
            .alias("mean_logit_micro_floor"),
        )
    )
