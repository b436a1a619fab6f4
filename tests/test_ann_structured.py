"""Structured-fixture ANN recall gate (VERDICT r8 #4).

The driver fixture's iid embeddings are PQ's worst case; real
embedding manifolds cluster. On a mixture-of-Gaussians fixture the
refine tier must reach recall@10 >= 0.8 at the repo's cheap default
(M=4, K=8) — the realistic number a user of "similarity search"
experiences. Full table (incl. K=64 and the iid contrast) is
measured by tools/ann_recall.py and recorded in BASELINE.md.
"""

from __future__ import annotations

import importlib.util
import os
import pytest
import sys

_SPEC = importlib.util.spec_from_file_location(
    "ann_recall",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "ann_recall.py",
    ),
)
ann_recall = importlib.util.module_from_spec(_SPEC)
sys.modules["ann_recall"] = ann_recall
_SPEC.loader.exec_module(ann_recall)


@pytest.mark.slow
def test_refine_recall_on_structured_vectors(spark, tmp_path):
    from kafkatoclickhouse_spark import registry
    from kafkatoclickhouse_spark.operators import kmeans as KM
    from kafkatoclickhouse_spark.operators import pq as PQ

    sf_dir = ann_recall.make_structured_embeddings(
        spark, str(tmp_path / "structured"), n=2000, clusters=16
    )
    truth = ann_recall.exact_truth(sf_dir)
    # default repo config (M=4, K=8) — fresh caches so the codebooks
    # train on THIS fixture
    PQ._BOOK_CACHE.clear()
    KM._TRAIN_CACHE.clear()
    try:
        rows = registry.QUERIES["sim_pq_refine_topk"](
            spark, sf_dir
        ).collect()
    finally:
        PQ._BOOK_CACHE.clear()
        KM._TRAIN_CACHE.clear()
    rec = ann_recall._mean_recall(rows, truth)
    assert rec >= 0.8, f"structured refine recall@10 {rec:.3f} < 0.8"


def test_sq8_refine_recall_on_structured_vectors(spark, tmp_path):
    """Raw SQ8 collapses on clustered vectors (within-cluster score
    gaps sit below the quantization step — measured 0.14), so the
    composition a deployment runs is SQ8 over-fetch + exact re-rank;
    that must reach recall@10 >= 0.8 here (measured 0.875)."""
    from kafkatoclickhouse_spark import registry

    sf_dir = ann_recall.make_structured_embeddings(
        spark, str(tmp_path / "structured_sq8"), n=2000, clusters=16
    )
    truth = ann_recall.cosine_truth(sf_dir)
    rows = registry.QUERIES["sim_sq8_refine_topk"](
        spark, sf_dir
    ).collect()
    rec = ann_recall._mean_recall(rows, truth)
    assert rec >= 0.8, f"structured sq8+refine recall@10 {rec:.3f} < 0.8"


def test_ivf_sq8_refine_recall_at_derived_nprobe(spark, tmp_path):
    """VERDICT r9 #4 gate: the COMPOSED production tier — adaptive
    mass-probe IVF prune + SQ8 code scan + exact refine — must reach
    recall@10 >= 0.8 on the structured fixture at the nprobe the
    τ = PROBE_MASS_NUM/DEN policy derives (not a hand-picked one).
    Measured 0.875 at τ=1/2 (derived nprobe ≈ 8.5/16); the fixed
    nprobe=2 it replaces scored 0.30 on iid and relied on luck on
    clustered data."""
    from kafkatoclickhouse_spark import registry

    sf_dir = ann_recall.make_structured_embeddings(
        spark, str(tmp_path / "structured"), n=2000, clusters=16
    )
    truth = ann_recall.cosine_truth(sf_dir)
    rows = registry.QUERIES["sim_ivf_sq8_refine_topk"](
        spark, sf_dir
    ).collect()
    rec = ann_recall._mean_recall(rows, truth)
    assert rec >= 0.8, f"composed IVF-SQ8-refine recall {rec:.3f} < 0.8"


def test_binary_refine_recall_on_structured_vectors(spark, tmp_path):
    """Binary sign-bit tier (r11): raw Hamming ranking scrambles the
    fine order exactly like SQ8 (measured 0.17 structured / 0.30
    iid), so the deployment composition is the 32x-compressed Hamming
    over-fetch + exact cosine re-rank; that must reach recall@10
    >= 0.8 here (measured 0.895 structured, 0.78 iid)."""
    from kafkatoclickhouse_spark import registry

    sf_dir = ann_recall.make_structured_embeddings(
        spark, str(tmp_path / "structured_bin"), n=2000, clusters=16
    )
    truth = ann_recall.cosine_truth(sf_dir)
    rows = registry.QUERIES["sim_binary_refine_topk"](
        spark, sf_dir
    ).collect()
    rec = ann_recall._mean_recall(rows, truth)
    assert rec >= 0.8, (
        f"structured binary+refine recall@10 {rec:.3f} < 0.8"
    )


def test_binary_refine_recall_on_iid_vectors(spark):
    """VERDICT r11 #7 gate: the iid driver fixture is the binary
    tier's worst case (1 bit/dim keeps only direction octants). At
    the r11 fetch depth of 100 it measured 0.78 — below the bar the
    structured gate enforces; the r12 top-200 Hamming over-fetch
    recovers 0.96. Gate both fixtures at >= 0.8 so a regression in
    either regime fails loudly."""
    from kafkatoclickhouse_spark import registry

    sf_dir = "/root/testdata/sf0.001"
    truth = ann_recall.cosine_truth(sf_dir)
    rows = registry.QUERIES["sim_binary_refine_topk"](
        spark, sf_dir
    ).collect()
    rec = ann_recall._mean_recall(rows, truth)
    assert rec >= 0.8, f"iid binary+refine recall@10 {rec:.3f} < 0.8"


def test_ivf_filtered_recall_and_predicate(spark, tmp_path):
    """r11 filtered ANN: every hit satisfies the predicate, and on
    clustered vectors the filtered-mass probe policy reaches high
    recall against the FILTERED brute-force truth (matching labels
    concentrate in few cells, which probe fully once the policy
    counts only matching members)."""
    import numpy as np

    from kafkatoclickhouse_spark import registry
    from kafkatoclickhouse_spark.operators import similarity as S

    sf_dir = ann_recall.make_structured_embeddings(
        spark, str(tmp_path / "fstruct"), n=2000, clusters=16
    )
    rows = registry.QUERIES["sim_ivf_filtered_topk"](spark, sf_dir).collect()
    assert rows
    assert all(r["label"] in S.FILTER_LABELS for r in rows)

    # filtered cosine ground truth (float64, self excluded)
    import duckdb

    con = duckdb.connect()
    data = con.execute(
        "SELECT vec_id, embedding, label FROM "
        f"'{tmp_path}/fstruct/embeddings.parquet/*.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data])
    em = np.array([r[1] for r in data], dtype=np.float64)
    labels = np.array([r[2] for r in data])
    em_n = em / np.linalg.norm(em, axis=1, keepdims=True)
    fmask = np.isin(labels, list(S.FILTER_LABELS))
    qids = ids[ids % S.QUERY_MOD == 0][: S.QUERY_LIMIT]
    truth = {}
    for q in qids:
        sims = em_n[fmask] @ em_n[ids == q][0]
        cand_ids = ids[fmask]
        keep = cand_ids != q
        order = np.argsort(-sims[keep])[: S.TOP_K]
        truth[int(q)] = set(int(x) for x in cand_ids[keep][order])
    rec = ann_recall._mean_recall(rows, truth)
    # measured 0.825 on this fixture (queries from ALL clusters,
    # most outside the predicate) — gate at the tier convention 0.8
    assert rec >= 0.8, f"filtered recall@10 {rec:.3f} < 0.8"
