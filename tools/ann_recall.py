"""ANN recall measurement on STRUCTURED (non-iid) embeddings
(VERDICT r8 #4).

The driver fixture's embeddings are iid-random — PQ's worst case,
since per-subspace codebooks exploit the correlation structure real
embedding manifolds have (module docstring, ``operators/pq.py``). A
user judging "similarity search" needs the realistic number, so this
tool synthesizes a clustered fixture (mixture of Gaussians — the
standard stand-in for encoder-output manifolds), runs the whole PQ
retrieval tier against exact numpy ground truth, and prints a
recall@10 table for:

  - raw ADC                       (``sim_pq_adc_topk``)
  - ADC + exact refine            (``sim_pq_refine_topk``)
  - IVF prune + ADC + refine      (``sim_ivfpq_refine_topk``)

at the repo's cheap default (M=4, K=8) AND a production-ish codebook
(K=64). Results are recorded in BASELINE.md; the structured-fixture
refine gate (>= 0.8) lives in tests/test_ann_structured.py.

Usage: python tools/ann_recall.py [n_vectors] [n_clusters]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from kafkatoclickhouse_spark import registry  # noqa: E402
from kafkatoclickhouse_spark.operators import kmeans as KM  # noqa: E402
from kafkatoclickhouse_spark.operators import pq as PQ  # noqa: E402


def make_structured_embeddings(
    spark,
    out_dir: str,
    n: int = 2000,
    dim: int = 64,
    clusters: int = 16,
    seed: int = 7,
    spread: float = 0.25,
    noise: float = 0.04,
) -> str:
    """Write an ``embeddings.parquet`` of clustered vectors: cluster
    centers ~ N(0, spread²) per dim, members = center + N(0, noise²)
    — the within-cluster correlation PQ codebooks exploit. float32
    like the driver fixture; vec_id dense from 0 so the query-vector
    selection rule (vec_id % 97 == 0) samples every cluster."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(0.0, spread, (clusters, dim))
    assign = rng.randint(0, clusters, n)
    vecs = centers[assign] + rng.normal(0.0, noise, (n, dim))
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(assign[i]))
        for i in range(n)
    ]
    os.makedirs(out_dir, exist_ok=True)
    spark.createDataFrame(
        rows, schema="vec_id bigint, embedding array<float>, label int"
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    return out_dir


def exact_truth(sf_dir: str, k: int = 10) -> dict[int, set[int]]:
    """Ground-truth top-k by exact L2 on the SAME 1e-6 grid the
    engine quantizes to, for the engine's query-vector rule."""
    import duckdb

    con = duckdb.connect()
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):  # Spark-written parquet is a directory
        path = os.path.join(path, "*.parquet")
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    em = np.floor(
        np.array([r[1] for r in rows], dtype=np.float64) * KM._GRID
    )
    qmask = ids % PQ.ADC_QUERY_MOD == 0
    qids = ids[qmask][: PQ.ADC_QUERY_LIMIT]
    truth = {}
    for q in qids:
        d = ((em - em[ids == q][0]) ** 2).sum(axis=1)
        d[ids == q] = np.inf
        top = ids[np.argsort(d, kind="stable")[:k]]
        truth[int(q)] = set(int(t) for t in top)
    return truth


def _mean_recall(rows, truth, id_col="neighbor_id") -> float:
    per_q: dict[int, set[int]] = {}
    for r in rows:
        per_q.setdefault(int(r["query_id"]), set()).add(int(r[id_col]))
    recs = [
        len(v & truth[q]) / len(truth[q])
        for q, v in per_q.items()
        if q in truth
    ]
    return sum(recs) / len(recs) if recs else 0.0


def measure(spark, sf_dir: str, pq_k: int) -> dict[str, float]:
    """recall@10 for the three retrieval tiers at codebook size
    ``pq_k`` (module constants swapped + caches cleared — the same
    knob a deployment sets once at build time)."""
    saved = (PQ.PQ_K, PQ.PQ_ITERS)
    PQ.PQ_K, PQ.PQ_ITERS = pq_k, max(PQ.PQ_ITERS, 2)
    PQ._BOOK_CACHE.clear()
    KM._TRAIN_CACHE.clear()
    try:
        truth = exact_truth(sf_dir)
        out = {}
        for tier, qname in (
            ("adc_raw", "sim_pq_adc_topk"),
            ("refine", "sim_pq_refine_topk"),
            ("ivfpq_refine", "sim_ivfpq_refine_topk"),
        ):
            rows = registry.QUERIES[qname](spark, sf_dir).collect()
            out[tier] = round(_mean_recall(rows, truth), 3)
        return out
    finally:
        PQ.PQ_K, PQ.PQ_ITERS = saved
        PQ._BOOK_CACHE.clear()
        KM._TRAIN_CACHE.clear()


def cosine_truth(sf_dir: str, k: int = 10) -> dict[int, set[int]]:
    """Exact-cosine ground truth under the SQ8 tier's query rule
    (vec_id % 100 == 0, first 64) — float64 cosine, argsort with
    stable neighbor-id tiebreak, self excluded."""
    import duckdb

    from kafkatoclickhouse_spark.operators import similarity as SIM

    con = duckdb.connect()
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    em = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((em * em).sum(axis=1))
    qids = ids[ids % SIM.QUERY_MOD == 0][: SIM.QUERY_LIMIT]
    truth = {}
    for q in qids:
        qv = em[ids == q][0]
        s = (em @ qv) / (norms * np.sqrt(qv @ qv))
        s[ids == q] = -np.inf
        top = ids[np.argsort(-s, kind="stable")[:k]]
        truth[int(q)] = set(int(t) for t in top)
    return truth


def measure_sq8(spark, sf_dir: str) -> dict[str, float]:
    """recall@10 of the scalar-quantized tier (SQ8 full scan,
    IVF-SQ8 with the adaptive mass-probe policy, and the full
    IVF-SQ8+refine composition) against exact cosine — the
    quantized-tier contrast rows for the PQ table above. Also
    reports the probe depth the mass policy derived (mean cells
    probed per query out of NUM_CENTROIDS)."""
    from kafkatoclickhouse_spark.operators import similarity as SIM

    truth = cosine_truth(sf_dir)
    out = {}
    for tier, qname in (
        ("sq8", "sim_sq8_topk"),
        ("sq8_refine", "sim_sq8_refine_topk"),
        ("ivf_sq8", "sim_ivf_sq8_topk"),
        ("ivf_sq8_refine", "sim_ivf_sq8_refine_topk"),
        ("ivf_float", "sim_ivf_topk"),
    ):
        rows = registry.QUERIES[qname](spark, sf_dir).collect()
        out[tier] = round(_mean_recall(rows, truth), 3)
    out["derived_nprobe_mean"] = _derived_nprobe(spark, sf_dir, SIM)
    return out


def _derived_nprobe(spark, sf_dir: str, SIM) -> float:
    """Mean probed-cell count per query under the mass policy — the
    nprobe the τ dial actually derived on this corpus."""
    import duckdb

    con = duckdb.connect()
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}'"
    )
    cos = (
        "list_cosine_similarity(q.qv, cent.cv)"
    )
    n = con.execute(
        f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cv FROM e
                 ORDER BY vec_id LIMIT {SIM.NUM_CENTROIDS}),
        assign AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT e.vec_id, cent.cid,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.v, cent.cv)
                       DESC, cent.cid) AS rn
            FROM e, cent)
          WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id % {SIM.QUERY_MOD} = 0
              ORDER BY vec_id LIMIT {SIM.QUERY_LIMIT}),
        sz AS (SELECT cell, COUNT(*) AS cnt FROM assign GROUP BY cell),
        probes AS (
          SELECT query_id FROM (
            SELECT q.query_id,
                   SUM(s.cnt) OVER (PARTITION BY q.query_id) AS total,
                   COALESCE(SUM(s.cnt) OVER (
                     PARTITION BY q.query_id
                     ORDER BY {cos} DESC, cent.cid
                     ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_prev
            FROM q, cent JOIN sz s ON s.cell = cent.cid)
          WHERE {SIM.PROBE_MASS_DEN} * cum_prev
                  < {SIM.PROBE_MASS_NUM} * total)
        SELECT AVG(c) FROM (
          SELECT COUNT(*) AS c FROM probes GROUP BY query_id)
        """
    ).fetchone()[0]
    return round(float(n), 2)


def main() -> None:
    import tempfile

    from kafkatoclickhouse_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("ann_recall")
    work = tempfile.mkdtemp(prefix="ann_recall_")
    out = {"n": n, "clusters": clusters, "recall_at_10": {}}
    try:
        sf_dir = make_structured_embeddings(
            spark, os.path.join(work, "structured"), n=n, clusters=clusters
        )
        for pq_k in (8, 64):
            out["recall_at_10"][f"structured_K{pq_k}"] = measure(
                spark, sf_dir, pq_k
            )
        # the iid driver fixture, same harness, for the contrast row
        for pq_k in (8, 64):
            out["recall_at_10"][f"iid_sf0.001_K{pq_k}"] = measure(
                spark, "/root/testdata/sf0.001", pq_k
            )
        # the scalar-quantized tier, exact-cosine truth
        out["recall_at_10"]["structured_sq8"] = measure_sq8(spark, sf_dir)
        out["recall_at_10"]["iid_sf0.001_sq8"] = measure_sq8(
            spark, "/root/testdata/sf0.001"
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
