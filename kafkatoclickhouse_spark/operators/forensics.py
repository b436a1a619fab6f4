"""Cross-source corpus forensics — inter-source duplication matrix.
[EXT] LLM-pipeline surface (SURVEY.md §2.2; the reference has no
corpus operators).

Web crawls contain mirror sites, syndication networks, and scraped
re-posts: whole SOURCES that largely duplicate other sources. The
per-document dedup family finds the pairs; this operator answers the
curation question one level up — WHICH sources overlap, and how much
— the report that drives "drop the mirror, keep the origin" source-
level decisions before any per-document pass runs.

Shape: distinct (source, shingle) pairs → shingle-keyed self-join
restricted to source_a < source_b → one count per source pair →
containment ppm against the smaller source's shingle set. A shingle
present in k sources contributes C(k,2) ≤ C(|sources|,2) join rows,
so the join output is ≤ C(S,2)·|distinct shingles| — linear in
corpus size with a small constant, and the final matrix is C(S,2)
rows regardless of corpus size. All ratios are integer ppm
(floor-of-cross-multiplication), so both engines agree bit-for-bit.

At 100 TB: the (source, shingle) distinct is the one data-scale
shuffle (shingle-keyed); the matrix aggregate is tiny. A hot shingle
(boilerplate present in every source) caps its pair fan-out at
C(S,2), not at document count — unlike document-pair joins, no
frequency cap is needed for safety.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions import hashing
from kafkatoclickhouse_spark.operators.dedup import SHINGLE_N
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table


@query(
    "corpus_source_overlap",
    oracle=f"""
    WITH {hashing.sql_word_shingles(SHINGLE_N)},
    ssrc AS (
      SELECT DISTINCT d.source, s.shingle
      FROM sh s JOIN documents d ON d.doc_id = s.doc_id
    ),
    per_src AS (SELECT source, COUNT(*) AS n_shingles
                FROM ssrc GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM ssrc a JOIN ssrc b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b, s.n_shared,
           pa.n_shingles AS n_a, pb.n_shingles AS n_b,
           CAST(FLOOR(s.n_shared * 1000000.0
                      / LEAST(pa.n_shingles, pb.n_shingles)) AS BIGINT)
             AS containment_ppm
    FROM shared s
    JOIN per_src pa ON pa.source = s.source_a
    JOIN per_src pb ON pb.source = s.source_b
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source-pair duplication matrix: for every source pair with
    at least one shared distinct shingle, the shared count, both
    sources' distinct-shingle sizes, and asymmetric containment in
    integer ppm against the SMALLER side (Broder containment at
    source granularity — a mirror shows ~1e6 ppm even when the
    origin is much larger). Pairs sharing nothing are absent: the
    matrix is sparse by construction."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ssrc = docs.select(
        "source",
        F.explode(
            hashing.word_shingles(F.col("text"), SHINGLE_N)
        ).alias("shingle"),
    ).distinct()
    per_src = ssrc.groupBy("source").agg(
        F.count("*").alias("n_shingles")
    )
    a = ssrc.select(
        F.col("source").alias("source_a"), "shingle"
    )
    b = ssrc.select(
        F.col("source").alias("source_b"), "shingle"
    )
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    pa = per_src.select(
        F.col("source").alias("source_a"),
        F.col("n_shingles").alias("n_a"),
    )
    pb = per_src.select(
        F.col("source").alias("source_b"),
        F.col("n_shingles").alias("n_b"),
    )
    return (
        shared.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.floor(
                F.col("n_shared")
                * F.lit(1000000)
                / F.least("n_a", "n_b")
            ).cast("long").alias("containment_ppm"),
        )
    )
