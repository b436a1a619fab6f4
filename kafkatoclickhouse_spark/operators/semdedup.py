"""SemDeDup — semantic deduplication via cluster-then-compare
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"). [EXT] LLM-pipeline surface; the
reference has no embedding operators (SURVEY.md §2.2).

The web-scale shape: an all-pairs cosine sweep over n vectors is
O(n²·d) and dead at corpus scale, but semantic duplicates are — by
definition — close in embedding space, so they land in the same
k-means cell. SemDeDup therefore (1) clusters the embeddings once,
(2) compares pairs ONLY within a cluster, and (3) keeps one
representative per near-identical group. Total pair work drops from
n² to Σ|cellᵢ|² — with K sized so cells stay bounded (the paper uses
50k clusters for 1.3e9 vectors; here ``kmeans.KM_K`` on the fixture),
that is linear-ish in n and embarrassingly parallel per cell.

Determinism contract (what makes this oracle-checkable):

  - the clustering is the exact integer-grid Lloyd trajectory from
    ``operators/kmeans.py`` — seeds, assign/update rounds, and the
    final assignment replay bit-identically in DuckDB via
    ``sql_lloyd_ctes``;
  - the within-cell cosine uses the same double fold both engines
    agree on (``functions/vector.py`` contract), compared raw
    against the threshold exactly like ``dedup_embedding_cosine``;
  - the survivor rule is greedy-by-id: a vector is REMOVED iff some
    lower vec_id in its cell is τ-close — one deterministic pass, no
    float accumulation across decisions. (The paper keeps a random
    / centroid-farthest member per ε-ball; keep-lowest-id is the
    same cardinality with a reproducible tie-break.)

Scale notes (100 TB): the cluster assignment is a pure map stage
against the centroid plan-literal (no shuffle of the vector table —
see ``kmeans._assign``); the pair join shuffles on cell id, so cell
population is the skew knob — production K grows with n to bound
|cell|, exactly the paper's regime, and a hot cell salts like any
skewed join key. Candidates carry (vec_id, vec_id) pairs only;
vectors hydrate once per side from the cell-partitioned table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions.vector import cosine_with_norms, norm
from kafkatoclickhouse_spark.operators.kmeans import (
    KM_ITERS,
    _GRID,
    _ranked_cells,
    _sql_rounds,
    _SQL_DIST,
    _train,
)
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

# Fixture-scale τ: the sf* embeddings are pseudo-random dim-64 floats
# where no pair clears 0.8 (see dedup.COSINE_BUCKETED_THRESHOLD's
# rationale) — 0.3 yields real within-cell duplicate groups so the
# removal path is actually exercised. A production run on trained
# text embeddings uses the paper's ε ≈ 0.95+.
SEMDEDUP_TAU = 0.3

_SQL_COSINE_RAW = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * "
    "sqrt(list_dot_product({b}, {b})))"
)


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, en, cluster): every vector with its L2
    norm and final-trajectory cell — one map stage, no shuffle."""
    em = fan_out(load_table(spark, sf_dir, "embeddings"))
    base = em.select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("en"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(_GRID)).cast(
                "long"
            ),
        ).alias("vq"),
    )
    cents = [(cid, cq) for cid, cq, _ in _train(spark, sf_dir)]
    return base.select(
        "vec_id",
        "embedding",
        "en",
        F.expr(_ranked_cells("vq", cents) + "[0].cid").alias("cluster"),
    )


def _sql_semdedup_ctes() -> str:
    """Suffixable CTE body: Lloyd replay → final cell per vector →
    within-cell τ-close pairs → removed set."""
    return f"""{_sql_rounds()},
    ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    sd_d AS (SELECT e.vec_id, c.cid, {_SQL_DIST} AS d
             FROM e, c{KM_ITERS} c, rng),
    sd_cell AS (SELECT vec_id, cid AS cluster
                FROM (SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY d, cid) AS rn
                      FROM sd_d)
                WHERE rn = 1),
    sd_removed AS (
      SELECT DISTINCT b.vec_id
      FROM sd_cell a
      JOIN sd_cell b ON a.cluster = b.cluster
                    AND a.vec_id < b.vec_id
      JOIN ev ea ON ea.vec_id = a.vec_id
      JOIN ev eb ON eb.vec_id = b.vec_id
      WHERE {_SQL_COSINE_RAW.format(a="ea.v", b="eb.v")}
            >= {SEMDEDUP_TAU}
    )"""


@query(
    "dedup_semdedup",
    oracle=f"""
    WITH {_sql_semdedup_ctes()}
    SELECT c.vec_id, c.cluster,
           (r.vec_id IS NULL) AS keep
    FROM sd_cell c LEFT JOIN sd_removed r ON r.vec_id = c.vec_id
    """,
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SemDeDup verdict: (vec_id, cluster, keep) — keep is
    false iff a lower-id vector in the same k-means cell is within
    cosine ``SEMDEDUP_TAU``. The full Lloyd trajectory, the cell
    assignment, AND the greedy survivor rule are hash-checked against
    the DuckDB replay, so a drifting centroid, a wrong tie-break, or
    an off-by-one in the pair predicate all fail parity."""
    assign = _assigned(spark, sf_dir)
    a = assign.select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster").alias("cl_a"),
        F.col("embedding").alias("va"),
        F.col("en").alias("na"),
    )
    b = assign.select(
        F.col("vec_id").alias("id_b"),
        F.col("cluster").alias("cl_b"),
        F.col("embedding").alias("vb"),
        F.col("en").alias("nb"),
    )
    sim = cosine_with_norms(
        F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
    )
    removed = (
        a.join(
            b,
            (F.col("cl_a") == F.col("cl_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(sim >= F.lit(SEMDEDUP_TAU))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("removed", F.lit(True))
    )
    return assign.join(removed, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.coalesce(~F.col("removed"), F.lit(True)).alias("keep"),
    )


@query(
    "dedup_semdedup_cluster_stats",
    oracle=f"""
    WITH {_sql_semdedup_ctes()}
    SELECT c.cluster,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN r.vec_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac
    FROM sd_cell c LEFT JOIN sd_removed r ON r.vec_id = c.vec_id
    GROUP BY c.cluster
    """,
)
def dedup_semdedup_cluster_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-cell dedup report: population, survivors, duplicate
    fraction — the artifact the paper's extreme-dedup analysis reads
    (which semantic regions of the corpus are redundancy-heavy), and
    at 100 TB the monitoring surface that tells you when a cell has
    grown skew-hot and K needs to scale up."""
    verdicts = dedup_semdedup(spark, sf_dir)
    return verdicts.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.round(
            F.sum((~F.col("keep")).cast("double")) / F.count("*"), 6
        ).alias("dup_frac"),
    )
