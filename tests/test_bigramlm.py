"""Bigram-LM perplexity filter pins (VERDICT r13 #1).

Beyond the oracle hash gates, three guarantees:
 - the SEPARATION the unigram scorer provably cannot make: a
   word-order-scrambled document scores strictly worse than its
   original under the bigram LM while keeping the identical bag of
   words (hence the identical unigram score);
 - the persisted lifecycle (eighth index family) is crash-safe,
   fingerprint-keyed, config-keyed (a bucket/seed constant change
   rebuilds — the packds staleness lesson), and the serve reads
   ONLY the artifact (poison pin);
 - the p90 filter keeps at least its target fraction and the
   kept/dropped sets split cleanly at the threshold bin.
"""

from __future__ import annotations

import json
import os
import random

from pyspark.sql import functions as F

from kafkatoclickhouse_spark.operators import bigramlm


def _planted_docs(spark):
    """Deterministic corpus: 30 repeats of natural sentences (ids
    0..29) + a scrambled twin of each (id + 1000). Scrambling
    preserves the token bag exactly."""
    sentences = [
        "the quick brown fox jumps over the lazy dog near the river",
        "a stitch in time saves nine and a penny saved is a penny earned",
        "all that glitters is not gold but the early bird catches the worm",
    ]
    rng = random.Random(17)
    rows = []
    for i in range(30):
        text = sentences[i % len(sentences)]
        rows.append((i, text))
        toks = text.split()
        scrambled = toks[:]
        while True:
            rng.shuffle(scrambled)
            if scrambled != toks:
                break
        rows.append((i + 1000, " ".join(scrambled)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrambled_docs_score_strictly_worse(spark):
    """The word-order pin: for every (original, scrambled) pair the
    scrambled twin's bigram NLL is STRICTLY higher, while the token
    bags are identical — so the unigram score (a function of the
    bag alone) cannot distinguish them. This is the separation that
    motivates the bigram family."""
    docs = _planted_docs(spark)
    nll = {
        r["doc_id"]: r["avg_nll_nats"]
        for r in bigramlm.bigram_nll(docs).collect()
    }
    bags = {
        r["doc_id"]: r["bag"]
        for r in docs.select(
            "doc_id",
            F.sort_array(
                F.split(F.lower(F.trim("text")), r"\s+")
            ).alias("bag"),
        ).collect()
    }
    for i in range(30):
        assert bags[i] == bags[i + 1000], i  # unigram-blind twin
        assert nll[i + 1000] > nll[i], (
            f"doc {i}: scrambled {nll[i + 1000]} !> original {nll[i]}"
        )


def test_perplexity_filter_keeps_target_fraction(spark, sf_dir):
    """keep count ≥ the 90% integer target, and the kept/dropped
    bins split cleanly at the threshold (bin-granular semantics)."""
    rows = bigramlm.text_bigram_perplexity_filter(
        spark, sf_dir
    ).collect()
    assert rows
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert len(kept) >= (bigramlm.KEEP_PCT * len(rows)) // 100
    if dropped:
        assert max(r["bin"] for r in kept) < min(
            r["bin"] for r in dropped
        )


def test_bigram_artifact_lifecycle_poison_and_config_staleness(
    spark, sf_dir
):
    """Build is fingerprint-cached with a meta-last marker; the
    trained serve reads ONLY model.parquet (poisoning it changes
    scores — no silent retrain); a bucket-config change in meta
    forces a rebuild (the VERDICT r13 staleness class)."""
    path = bigramlm.text_bigram_index_build(spark, sf_dir)
    meta_path = os.path.join(path, "meta.json")
    meta = json.load(open(meta_path))
    assert meta["v"] > 0 and meta["n_unique_bigrams"] > 0
    mtime = os.path.getmtime(meta_path)
    assert bigramlm.text_bigram_index_build(spark, sf_dir) == path
    assert os.path.getmtime(meta_path) == mtime

    before = {
        r["doc_id"]: r["avg_nll_nats"]
        for r in bigramlm.text_bigram_logperp_trained(
            spark, sf_dir
        ).collect()
    }
    assert before

    # poison: inflate every transition count 1000× in the artifact
    pq = os.path.join(path, "model.parquet")
    poisoned = spark.read.parquet(pq).withColumn(
        "c12", F.col("c12") * 1000
    )
    poisoned.write.mode("overwrite").parquet(pq + ".tmp")
    import shutil

    shutil.rmtree(pq)
    os.rename(pq + ".tmp", pq)
    try:
        after = {
            r["doc_id"]: r["avg_nll_nats"]
            for r in bigramlm.text_bigram_logperp_trained(
                spark, sf_dir
            ).collect()
        }
        assert after != before, "poisoned artifact did not change serve"
    finally:
        bigramlm.text_bigram_index_build(spark, sf_dir, force=True)

    # config staleness: an artifact recorded under different bucket
    # constants must rebuild, not serve
    stale = dict(json.load(open(meta_path)))
    stale["bigram_buckets"] = bigramlm.BIGRAM_BUCKETS - 1
    with open(meta_path, "w") as fh:
        json.dump(stale, fh)
    try:
        assert bigramlm.text_bigram_index_build(spark, sf_dir) == path
        rebuilt = json.load(open(meta_path))
        assert rebuilt["bigram_buckets"] == bigramlm.BIGRAM_BUCKETS
    finally:
        bigramlm.text_bigram_index_build(spark, sf_dir, force=True)


def test_trained_serve_equals_direct_on_fresh_artifact(spark, sf_dir):
    """On the corpus the model was trained on, every transition is
    in the model, so the LEFT-join serve path must equal the direct
    in-plan query exactly (same integers)."""
    direct = {
        (r["doc_id"], r["n_bigrams"], r["avg_nll_nats"])
        for r in bigramlm.text_bigram_logperp(spark, sf_dir).collect()
    }
    served = {
        (r["doc_id"], r["n_bigrams"], r["avg_nll_nats"])
        for r in bigramlm.text_bigram_logperp_trained(
            spark, sf_dir
        ).collect()
    }
    assert direct == served
