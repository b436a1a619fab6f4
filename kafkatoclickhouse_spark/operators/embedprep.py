"""Embedding preprocessing — unit normalization and MRL-style
truncation. [EXT] LLM-pipeline surface (SURVEY.md §2.2).

Every retrieval/dedup stack preprocesses its vectors: cosine-based
systems store UNIT-normalized embeddings (so dot product = cosine
and the index skips per-query norm work), and Matryoshka-style
models (Kusupati et al. 2022, "Matryoshka Representation Learning")
serve truncated prefixes of the full vector — a storage/recall dial
that drops dimensions, then re-normalizes. Both are pure maps; the
value of registering them is the measured CONTRACT: truncation's
retained-energy ratio is reported per vector, so a corpus run shows
the recall price of a prefix length before any index is rebuilt.

Determinism: all outputs are doubles produced by the same IEEE ops
in the same order in both engines (divide by the fold-order-stable
L2 norm from ``functions/vector.py``), rounded to 6 decimals — the
established cosine contract. Zero vectors normalize to NULL
components rather than NaN, explicitly.

Scale: both operators are map-only over the embeddings scan — no
shuffle, no join; at 100 TB they run inside whole-stage codegen
(the fixture fan-out round-robin is the only exchange locally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions.vector import norm
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

MRL_DIM = 16  # truncation prefix length (full fixture dim is 64)

_SQL_NORM = (
    "sqrt(list_aggregate(list_transform({v}, x -> x * x), 'sum'))"
)


@query(
    "embedding_normalize_unit",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT vec_id,
           CASE WHEN {_SQL_NORM.format(v="v")} = 0 THEN NULL
                ELSE list_transform(
                       v, x -> ROUND(x / {_SQL_NORM.format(v="v")}, 6))
           END AS unit,
           ROUND({_SQL_NORM.format(v="v")}, 6) AS l2_norm
    FROM e
    """,
)
def embedding_normalize_unit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unit-normalized embedding (components rounded to 6 decimals)
    plus the original L2 norm — the stored form a cosine index wants
    (dot product of unit vectors IS the cosine, so scoring skips the
    per-pair norm). Zero vectors yield NULL, not NaN."""
    em = fan_out(load_table(spark, sf_dir, "embeddings"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    n = norm(F.col("embedding"))
    unit = F.when(
        n != 0.0,
        F.transform(v, lambda x: F.round(x / n, 6)),
    )
    return em.select(
        "vec_id",
        unit.alias("unit"),
        F.round(n, 6).alias("l2_norm"),
    )


@query(
    "embedding_truncate_mrl",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    t AS (SELECT vec_id, v, v[1 : {MRL_DIM}] AS p FROM e)
    SELECT vec_id,
           CASE WHEN {_SQL_NORM.format(v="p")} = 0 THEN NULL
                ELSE list_transform(
                       p, x -> ROUND(x / {_SQL_NORM.format(v="p")}, 6))
           END AS unit_prefix,
           CAST(FLOOR(
             list_aggregate(list_transform(p, x -> x * x), 'sum')
             * 1000000.0
             / list_aggregate(list_transform(v, x -> x * x), 'sum')
           ) AS BIGINT) AS energy_ppm
    FROM t
    """,
)
def embedding_truncate_mrl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka truncation: keep the first ``MRL_DIM`` components,
    re-normalize to unit length, and report the retained-energy
    ratio (‖prefix‖²/‖full‖² in integer ppm) — the per-vector signal
    for how much of the representation a prefix index keeps. A
    corpus-level floor on energy_ppm is the go/no-go check before
    serving the truncated tier."""
    em = fan_out(load_table(spark, sf_dir, "embeddings"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    p = F.slice(v, 1, MRL_DIM)
    sq = lambda c: F.aggregate(  # noqa: E731 — local fold helper
        c, F.lit(0.0), lambda acc, x: acc + x * x
    )
    pn = F.sqrt(sq(p))
    unit = F.when(
        pn != 0.0,
        F.transform(p, lambda x: F.round(x / pn, 6)),
    )
    return em.select(
        "vec_id",
        unit.alias("unit_prefix"),
        F.floor(sq(p) * F.lit(1000000.0) / sq(v))
        .cast("long")
        .alias("energy_ppm"),
    )
