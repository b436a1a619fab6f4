"""Iterative graph algorithms: connected components for duplicate
clustering ([EXT] — the reference has no join, let alone an iterative
operator; SURVEY §2.2).

Near-duplicate detection emits PAIRS (``dedup.ngram_jaccard_pairs``,
``dedup_minhash_lsh``), but a training-corpus pipeline needs
CLUSTERS: if A≈B and B≈C, all three are one duplicate group even when
A and C themselves sit below the similarity threshold, and exactly
one survivor per group should be kept. That pairs→groups step is
connected components on the similarity graph.

Implementation is min-label propagation *with pointer jumping* as a
driver-side loop over DataFrame ops — the Pregel pattern without
GraphX (which has no Python API): every vertex starts labeled with
its own id; each round every vertex takes the min of its label and
its neighbors' labels (propagation, +1 hop), then replaces its label
with its label's label (pointer jump — path doubling, the same
shortcut large-star/small-star uses; Kiveris et al., "Connected
Components in MapReduce and Beyond"). Propagate-then-jump covers
distance 2^k after k rounds, so fixpoint lands in O(log diameter)
rounds even on an adversarial path graph (pinned by a 1000-node-path
property test under a 16-round budget), while duplicate-cluster
near-cliques still converge in 2-3 rounds.

Scale notes per round: one shuffle to join labels onto edges, one to
re-min per vertex — both keyed on vertex id, so AQE coalesces them;
``localCheckpoint`` truncates the lineage so round N's plan does not
replay rounds 1..N-1 (the classic iterative-DataFrame trap), and the
convergence probe reads a 1-row aggregate, not the labels
themselves. This IS a driver loop, but over distributed ops — the
per-round work and state never leave the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.operators import dedup
from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_table


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """``(id, component)`` for every vertex, where component = the
    smallest vertex id reachable through ``edges`` (undirected; the
    input edge list need not be symmetric — it is symmetrized here).
    Deterministic for any execution order: min over a component is
    order-free. Converges in O(log diameter) rounds: each round is
    one neighbor-min propagation plus one pointer jump, so the
    distance a component minimum has traveled at least doubles per
    round (f(k+1) >= 2 f(k) + 1 → covered distance 2^k - 1)."""
    sym = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionAll(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint()
    # Labels only ever decrease, so the label sum is a strictly
    # decreasing convergence metric — no self-join needed to detect
    # the fixpoint. decimal(38,0) so the probe cannot overflow at any
    # vertex count.
    probe = F.sum(F.col("label").cast("decimal(38,0)"))
    total = labels.agg(probe).first()[0]
    for _ in range(max_iter):
        msgs = sym.join(
            labels.withColumnRenamed("id", "src_id"),
            F.col("src") == F.col("src_id"),
        ).select(F.col("dst").alias("id"), "label")
        propagated = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # Pointer jump: label(v) := label(label(v)). Labels are always
        # vertex ids present in `labels` (min over ids stays an id),
        # so the parent join is total; labels only decrease, so the
        # convergence probe below is untouched. One extra id-keyed
        # shuffle per round buys O(log diameter) total rounds.
        parent = propagated.select(
            F.col("id").alias("p_id"), F.col("label").alias("p_label")
        )
        labels = (
            propagated.join(parent, F.col("label") == F.col("p_id"))
            .select("id", F.col("p_label").alias("label"))
            .localCheckpoint()
        )
        new_total = labels.agg(probe).first()[0]
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select("id", F.col("label").alias("component"))


@query(
    "dedup_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE {dedup._SQL_SHINGLES},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT s.doc_a, s.doc_b
      FROM shared s
      JOIN sizes za ON za.doc_id = s.doc_a
      JOIN sizes zb ON zb.doc_id = s.doc_b
      WHERE s.c * 1.0 / (za.n + zb.n - s.c) >= {dedup.JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src
    )
    SELECT id AS doc_id, MIN(lbl) AS cluster_id,
           CAST(MIN(lbl) = id AS BOOLEAN) AS is_canonical
    FROM reach GROUP BY id
    """,
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document labeled with its duplicate-cluster id (the min
    doc_id transitively reachable over exact-Jaccard ≥ 0.8 pairs) and
    whether it is the cluster's canonical survivor. Singleton docs
    are their own cluster — the output is a total assignment, which
    is what a keep-one-per-cluster filter downstream consumes.

    The oracle is the same fixpoint as SQL: a recursive CTE
    transitive closure, feasible only because correctness runs at
    small SF — the Spark side's per-round cost is linear in edges,
    the CTE's closure is not."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(spark, sf_dir)
    comp = connected_components(
        docs.select("doc_id"),
        pairs,
        id_col="doc_id",
        src="doc_a",
        dst="doc_b",
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("id")).alias("is_canonical"),
    )
