"""Lloyd k-means over ``embeddings`` ([EXT] — LLM-pipeline surface;
the reference has no iterative operator, SURVEY §2.2).

The coarse quantizer behind IVF indexing, corpus clustering for
curriculum/mixture balancing, and semantic dedup all start with a
k-means pass. This is the real iterative algorithm — seed, then
``KM_ITERS`` alternations of assign (argmin squared-L2) and update
(cluster mean), then a final assignment — NOT a one-shot heuristic.

**Exactness across engines, the hard part.** Float k-means is not
hash-checkable: both the distance sums and the centroid means drift
with partition order. Everything here therefore runs on the 1e-6
fixed-point grid (the ``embedding_label_centroids`` trick, extended
to the whole loop):

  - components quantize once: xq = floor(x * 1e6) as int64;
  - distances are exact integer sums of (xq - cq)^2 — with |x| < 1
    and DIM = 64 the total stays < 2^47, far inside int64;
  - centroid updates floor the integer-sum / count quotient back
    onto the grid (floor, not round — no half-tie to split), so
    every iteration's centroids are again exact integer vectors;
  - argmin ties break on the smaller cluster id.

Every quantity in every round is an integer both engines compute
bit-identically, so the DuckDB oracle replays the full trajectory —
seeds, both updates, final assignment — and the parity gate checks
the *algorithm*, not a tolerance band.

Scale shape: per iteration the data-side work is a row-local argmin
against the centroid table shipped as a plan literal (K·DIM int64 =
kilobytes) and one (cid, pos)-keyed partial aggregation — the
canonical distributed Lloyd step, linear per pass at any corpus
size, with NO shuffle or join in the assignment. The round barrier
is a driver collect of those same K·DIM scalars (what MLlib's
KMeans does); vectors never leave the executors. Seeds are the K
lowest vec_ids (deterministic; k-means|| would replace this at
production K, same loop body). Clusters that lose all members drop
out, identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions.vector import cosine_with_norms, norm
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import fan_out, load_table

KM_K = 8
KM_ITERS = 2
_DIM = 64
_GRID = 1000000.0


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = fan_out(load_table(spark, sf_dir, "embeddings"))
    return em.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(_GRID)).cast(
                "long"
            ),
        ).alias("vq"),
    )


def _cent_literal(cents: list[tuple[int, list[int]]]) -> str:
    """The centroid table as ONE parsed SQL literal —
    array<struct<cid:int, v:array<bigint>>> in ascending cid order.
    K·DIM int64s is kilobytes; shipping it in the plan (task closure)
    makes assignment a pure map stage. String-parsed once, not built
    element-by-element, for the same py4j-round-trip reason as the
    LSH plane literals."""
    items = ", ".join(
        "named_struct('cid', {c}, 'v', array({v}))".format(
            c=int(cid), v=", ".join(f"{int(x)}L" for x in vec)
        )
        for cid, vec in sorted(cents, key=lambda t: t[0])
    )
    return f"array({items})"


def _ranked_cells(vq_col: str, cents: list[tuple[int, list[int]]]) -> str:
    """SQL expr: all centroids as struct<d, cid>, ascending by exact
    integer distance then cid — argmin is [0], probes are a slice.
    array_sort on structs compares fields in order, so the tie on d
    breaks toward the smaller cid, identically to the oracle's
    ROW_NUMBER ordering."""
    return (
        f"array_sort(transform({_cent_literal(cents)}, s -> named_struct("
        f"'d', aggregate(zip_with({vq_col}, s.v, (x, y) -> (x - y) * (x - y)),"
        " 0L, (a, b) -> a + b), 'cid', s.cid)))"
    )


def _assign(e: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """(vec_id, vq, cid, d): each vector's nearest centroid; ties on
    distance break toward the smaller cid. Pure MAP stage — the
    argmin runs against the centroid literal inside the row, no
    join, no window, no shuffle of the vector table."""
    best = F.expr(_ranked_cells("vq", cents) + "[0]")
    return e.select(
        "vec_id",
        "vq",
        best["cid"].alias("cid"),
        best["d"].alias("d"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """(cid, cq, n_vectors): floor-of-mean per dimension, back on the
    integer grid. posexplode keeps shuffle state to one running sum
    per (cid, pos) — no whole-vector collect_list."""
    per_pos = (
        assigned.select("cid", F.posexplode("vq").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            F.floor(F.sum("x").cast("double") / F.count("*"))
            .cast("long")
            .alias("c"),
            F.count("*").alias("n"),
        )
    )
    return per_pos.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cq"),
        F.max("n").alias("n_vectors"),
    )


def train_on(
    e: DataFrame, k: int = KM_K, iters: int = KM_ITERS
) -> list[tuple[int, list[int], int]]:
    """Run the Lloyd loop over any (vec_id, vq) frame; return the
    final (cid, cq, n_vectors) rows. The per-round driver sync is a
    ``collect()`` of K·DIM int64 scalars — kilobytes, the canonical
    distributed-Lloyd round barrier (MLlib's KMeans does exactly
    this) and NOT a data-path collect: vectors never leave the
    executors. Collecting also truncates lineage between rounds, so
    round N's plan doesn't re-nest rounds 1..N-1 (the
    iterative-DataFrame trap). Shared by the full-space queries here
    and the per-subspace PQ codebooks (operators/pq.py)."""
    seeds = e.orderBy("vec_id").limit(k).collect()
    cents = [(i, list(r["vq"])) for i, r in enumerate(seeds)]
    rows: list[tuple[int, list[int], int]] = []
    for _ in range(iters):
        rows = sorted(
            (int(r["cid"]), list(r["cq"]), int(r["n_vectors"]))
            for r in _update(_assign(e, cents)).collect()
        )
        cents = [(cid, cq) for cid, cq, _ in rows]
    return rows


_TRAIN_CACHE: dict[tuple, list[tuple[int, list[int], int]]] = {}


def _train(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[int], int]]:
    """Full-space coarse quantizer for one fixture dir, memoized per
    (path, mtime, size) fingerprint — training is deterministic in
    the input (grid-exact Lloyd), so the trained rows ARE a
    persistable artifact; the memo is the in-process half of the
    train-once-serve-many lifecycle (`operators/pq.py`'s
    ``embedding_pq_index_build`` is the durable half), and the
    fingerprint key invalidates it if the fixture is regenerated
    (r7 ADVICE on the codebook memo)."""
    from kafkatoclickhouse_spark.tables import table_fingerprint

    key = table_fingerprint(sf_dir, "embeddings")
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = train_on(_quantized(spark, sf_dir))
    return _TRAIN_CACHE[key]


# --- DuckDB oracle: replay the identical trajectory -----------------

_SQL_DIST = (
    "list_aggregate(list_transform(rs, i -> "
    "(e.vq[i + 1] - c.cq[i + 1]) * (e.vq[i + 1] - c.cq[i + 1])), 'sum')"
)


def sql_lloyd_ctes(
    e_name: str, sfx: str, dim: int, k: int, iters: int
) -> str:
    """The Lloyd trajectory as suffixable DuckDB CTEs over an
    existing vector CTE ``e_name`` with (vec_id, vq): emits
    ``rng{sfx}``, ``c{sfx}0`` … ``c{sfx}{iters}`` plus the per-round
    ``d/a/u`` tables — the same exact-integer-grid replay the
    full-space oracle uses, parametrized so product-quantization
    subspaces (operators/pq.py) train their codebooks with the
    identical machinery."""
    dist = (
        "list_aggregate(list_transform(rs, i -> "
        "(e.vq[i + 1] - c.cq[i + 1]) * (e.vq[i + 1] - c.cq[i + 1]))"
        ", 'sum')"
    )
    ctes = [
        f"""
    rng{sfx} AS (SELECT list(CAST(i AS INTEGER)) AS rs
            FROM (SELECT unnest(range({dim})) AS i)),
    c{sfx}0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                       AS INTEGER) AS cid, vq AS cq
           FROM (SELECT * FROM {e_name} ORDER BY vec_id LIMIT {k}))
    """
    ]
    for it in range(1, iters + 1):
        ctes.append(f"""
    d{sfx}{it} AS (SELECT e.vec_id, e.vq, c.cid, {dist} AS d
              FROM {e_name} e, c{sfx}{it - 1} c, rng{sfx}),
    a{sfx}{it} AS (SELECT vec_id, vq, cid
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY d, cid) AS rn
                    FROM d{sfx}{it})
              WHERE rn = 1),
    u{sfx}{it} AS (SELECT cid, r AS pos,
                     CAST(FLOOR(CAST(SUM(vq[r + 1]) AS DOUBLE)
                                / COUNT(*)) AS BIGINT) AS c,
                     COUNT(*) AS n
              FROM a{sfx}{it}, (SELECT unnest(range({dim})) AS r)
              GROUP BY cid, r),
    c{sfx}{it} AS (SELECT cid, list(c ORDER BY pos) AS cq,
                          MAX(n) AS n_vectors
              FROM u{sfx}{it} GROUP BY cid)
    """)
    return ",".join(ctes)


SQL_E_CTE = f"""
    e AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(FLOOR(x * {int(_GRID)})
                                          AS BIGINT)) AS vq
          FROM embeddings)
"""


def _sql_rounds() -> str:
    return SQL_E_CTE + "," + sql_lloyd_ctes("e", "", _DIM, KM_K, KM_ITERS)


@query(
    "embedding_kmeans_assign",
    oracle=f"""
    WITH {_sql_rounds()},
    df AS (SELECT e.vec_id, c.cid, {_SQL_DIST} AS d
           FROM e, c{KM_ITERS} c, rng)
    SELECT vec_id, cid AS cluster, CAST(d AS BIGINT) AS dist_sq_micro
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM df)
    WHERE rn = 1
    """,
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final cluster assignment after the full Lloyd trajectory
    (seeds → {KM_ITERS} assign/update rounds → assign): one row per
    vector with its cluster and the exact integer squared distance on
    the micro grid. The hash-checked trajectory means a wrong seed
    order, a drifting mean, or a tie broken differently would all
    fail parity — not just a wildly wrong final partition."""
    e = _quantized(spark, sf_dir)
    cents = [(cid, cq) for cid, cq, _ in _train(spark, sf_dir)]
    return _assign(e, cents).select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.col("d").alias("dist_sq_micro"),
    )


@query(
    "embedding_kmeans_centroids",
    oracle=f"""
    WITH {_sql_rounds()}
    SELECT cid AS cluster, CAST(pos AS INTEGER) AS pos,
           CAST(c AS DOUBLE) / 1000000.0 AS centroid,
           n AS n_vectors
    FROM u{KM_ITERS}
    """,
)
def embedding_kmeans_centroids(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The trained coarse quantizer itself: per (cluster, dimension)
    the centroid component after the final update, de-quantized to
    double, plus the cluster population — the artifact an IVF index
    build or a mixture-balance report consumes. The trained rows are
    already on the driver (K·DIM scalars — the Lloyd round barrier);
    re-parallelized here only to posexplode into the flat shape."""
    rows = _train(spark, sf_dir)
    cents = spark.createDataFrame(
        rows, schema="cid int, cq array<bigint>, n_vectors bigint"
    )
    return cents.select(
        F.col("cid").alias("cluster"),
        F.posexplode("cq").alias("pos", "c"),
        "n_vectors",
    ).select(
        "cluster",
        "pos",
        (F.col("c").cast("double") / F.lit(_GRID)).alias("centroid"),
        "n_vectors",
    )


# --- IVF retrieval over the trained quantizer -----------------------


def _sql_ivf_kmeans() -> str:
    from kafkatoclickhouse_spark.operators import similarity as S

    return f"""
    WITH {_sql_rounds()},
    ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    ad AS (SELECT e.vec_id, c.cid, {_SQL_DIST} AS d
           FROM e, c{KM_ITERS} c, rng),
    acell AS (SELECT vec_id, cid AS cell
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY d, cid) AS rn
                    FROM ad)
              WHERE rn = 1),
    q AS (SELECT vec_id AS query_id FROM e
          WHERE vec_id % {S.QUERY_MOD} = 0
          ORDER BY vec_id LIMIT {S.QUERY_LIMIT}),
    probes AS (SELECT query_id, cell
               FROM (SELECT a.vec_id AS query_id, a.cid AS cell,
                            ROW_NUMBER() OVER (
                              PARTITION BY a.vec_id
                              ORDER BY a.d, a.cid) AS rn
                     FROM ad a JOIN q ON q.query_id = a.vec_id)
               WHERE rn <= {S.NPROBE}),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {S._SQL_COSINE.format(a="qe.v", b="ne.v")} AS s
      FROM probes p
      JOIN acell a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN ev qe ON qe.vec_id = p.query_id
      JOIN ev ne ON ne.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(s, 6) AS score,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {S.TOP_K}
    """


@query("sim_ivf_kmeans_topk", oracle=_sql_ivf_kmeans())
def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k over the UNSUPERVISED k-means quantizer — the
    composition ``sim_ivf_topk``'s docstring promises: train the
    codebook (Lloyd above), assign every vector to its nearest cell
    by the same exact grid metric, probe each query's NPROBE best
    cells, score exactly (cosine) inside them. Unlike
    ``sim_ivf_topk`` (first-K-vectors centroids, a training
    stand-in) and ``sim_ivf_labels`` paths, nothing here leans on a
    label column — this is the index build a real corpus gets.

    Scale: training is ITERS linear passes; cell assignment is a
    pure MAP against the centroid literal (no join, no shuffle) and
    at 100 TB happens once at ingest; retrieval is an equi-join on
    cell id pruning ~(1 - nprobe/K) of the table; queries stay
    broadcast. Cell assignment and probe ranking run on the exact
    integer grid, so candidate sets — and therefore results — are
    oracle-replayable bit-for-bit."""
    from kafkatoclickhouse_spark.operators import similarity as S

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
    ranked = _ranked_cells("vq", cents)
    assign = base.select(
        "vec_id",
        "embedding",
        "en",
        F.expr(ranked + "[0].cid").alias("cell"),
    )
    probes = (
        base.filter((F.col("vec_id") % S.QUERY_MOD) == 0)
        .orderBy("vec_id")
        .limit(S.QUERY_LIMIT)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("en").alias("qn"),
            F.explode(
                F.expr(f"slice({ranked}, 1, {S.NPROBE}).cid")
            ).alias("qcell"),
        )
    )
    scored = assign.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("qcell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_with_norms(
            F.col("qv"), F.col("embedding"), F.col("qn"), F.col("en")
        ).alias("s"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("s"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= S.TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("s", 6).alias("score"),
            F.col("rn").alias("rank"),
        )
    )
