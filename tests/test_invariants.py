"""Deeper invariants: dirty-data routing, ANN recall vs ground
truth, and hypothesis property tests for the portable primitives."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafkatoclickhouse_spark import registry
from kafkatoclickhouse_spark.operators import ingest
from kafkatoclickhouse_spark.streaming import count_window as cw

# -- dirty-data routing (R3: every record lands exactly once) ---------------

DIRTY_CASES = [
    # (payload JSON, is_clean) — FIXTURES.md §B dirty cases
    ('{"essCode": "E1", "cTime": "2024-01-01 00:00:00", "power": "1"}', True),
    ('{"cTime": "2024-01-01 00:00:00"}', False),  # missing essCode
    ('{"essCode": "E1"}', False),  # missing cTime
    ('{"power": "5"}', False),  # both missing
    ('{"essCode": "", "cTime": "2024-01-01 00:00:00"}', False),  # empty≈null
    ('{"essCode": "E1", "cTime": ""}', False),
    ("not json at all", False),  # malformed → from_json nulls → dirty
    ('{"essCode": null, "cTime": "2024-01-01 00:00:00"}', False),
]


def test_split_clean_dirty_partitions_exactly(spark):
    raw = spark.createDataFrame(
        [
            Row(value=v, topic="t", partition=0, offset=i)
            for i, (v, _) in enumerate(DIRTY_CASES)
        ]
    )
    parsed = ingest.parse_and_enrich(raw)
    clean, dirty = ingest.split_clean_dirty(parsed)
    n_clean_expected = sum(ok for _, ok in DIRTY_CASES)
    assert clean.count() == n_clean_expected
    assert dirty.count() == len(DIRTY_CASES) - n_clean_expected
    # offsets partition exactly: nothing lost, nothing duplicated
    got = sorted(
        r["topicOffset"]
        for r in clean.select("topicOffset")
        .union(dirty.select("topicOffset"))
        .collect()
    )
    assert got == list(range(len(DIRTY_CASES)))


# -- ANN recall vs brute-force ground truth --------------------------------


@pytest.mark.parametrize(
    "ann_name",
    ["sim_ann_lsh_topk", "sim_ivf_topk", "sim_ivf_kmeans_topk"],
)
def test_ann_recall_and_score_exactness(spark, sf_dir, ann_name):
    """Three properties that make an ANN result trustworthy:
    1. every returned (query, neighbor) pair carries the EXACT cosine
       the brute-force path computes (ANN prunes candidates, never
       distorts scores);
    2. the high-similarity band (cos ≥ 0.8 — planted near-dups, the
       pairs ANN exists to find) is recovered at ≥ 80%;
    3. overall recall@10 clears a sanity floor (0.1) — on near-random
       vectors single-table LSH/IVF recall is legitimately modest;
       raising it means more probes/tables, a recall-vs-cost dial,
       not a correctness fix."""
    truth = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in registry.QUERIES["sim_topk_bruteforce"](
            spark, sf_dir
        ).collect()
    }
    ann = registry.QUERIES[ann_name](spark, sf_dir).collect()
    assert ann
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in ann
    }
    for pair, score in exact.items():
        if pair in truth:
            assert abs(truth[pair] - score) < 1e-9, pair
    near_dups = {p for p, s in truth.items() if s >= 0.8}
    if near_dups:
        found = sum(1 for p in near_dups if p in exact)
        assert found / len(near_dups) >= 0.8, (
            f"{ann_name} found {found}/{len(near_dups)} near-dup pairs"
        )
    recall = sum(1 for p in exact if p in truth) / len(truth)
    assert recall >= 0.1, f"{ann_name} recall@10 = {recall:.2f}"


# -- hypothesis: portable primitives ---------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=40
    ),
    st.integers(min_value=2, max_value=7),
)
def test_count_window_conservation(values, n):
    """Under ANY split of the input into micro-batches, emitted full
    windows + retained tail exactly partition the input in order."""
    fn = cw.make_count_window_fn(n=n, timeout_ms=1000)

    class S:
        exists = False
        hasTimedOut = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self.exists = False

        def setTimeoutDuration(self, ms):
            pass

    st_ = S()
    emitted = []
    # split input into two arbitrary chunks
    cut = len(values) // 2
    for chunk in (values[:cut], values[cut:]):
        if not chunk:
            continue
        pdf = pd.DataFrame({"essCode": ["E"] * len(chunk), "v": chunk})
        for out in fn(("E",), [pdf], st_):
            emitted.extend(out["v"].tolist())
            # only full windows fire on data; consecutive windows
            # arrive as ONE vectorized frame (window_id delimits)
            assert len(out) % n == 0 and len(out) > 0
            ids = out["window_id"].tolist()
            assert ids == sorted(ids)
            assert out["window_pos"].tolist() == list(range(n)) * (
                len(out) // n
            )
    st_.hasTimedOut = True
    for out in fn(("E",), [], st_):
        emitted.extend(out["v"].tolist())
        assert len(out) < n or n == 1  # timeout flushes the partial
    assert emitted == values  # order-preserving, lossless


@settings(max_examples=10, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=80,
    )
)
def test_fingerprint_whitespace_invariance(spark, s):
    """fingerprint(text) is invariant under leading/trailing blanks
    and internal whitespace runs — the normalization contract
    dedup_exact relies on."""
    from kafkatoclickhouse_spark.functions import textfns

    df = spark.createDataFrame(
        [Row(a=s, b=f"  {s}  "), Row(a=s, b=s.replace(" ", "   "))]
    )
    rows = df.select(
        textfns.fingerprint(F.col("a")).alias("fa"),
        textfns.fingerprint(F.col("b")).alias("fb"),
    ).collect()
    for r in rows:
        assert r["fa"] == r["fb"]


def test_observed_clean_counts_in_one_pass(spark):
    """df.observe metrics: total/dirty counts must materialize as a
    side effect of the SAME action that consumes the clean stream —
    no second job over the source — and agree with the explicit
    split."""
    from pyspark.sql import Observation

    raw = spark.createDataFrame(
        [
            Row(value=v, topic="t", partition=0, offset=i)
            for i, (v, _) in enumerate(DIRTY_CASES)
        ]
    )
    parsed = ingest.parse_and_enrich(raw)
    obs = Observation("ingest_validation")
    clean = ingest.observed_clean(parsed, observation=obs)
    n_clean = clean.count()  # the one action; metrics ride along
    metrics = obs.get
    n_clean_expected = sum(ok for _, ok in DIRTY_CASES)
    assert n_clean == n_clean_expected
    assert metrics["n_total"] == len(DIRTY_CASES)
    assert metrics["n_dirty"] == len(DIRTY_CASES) - n_clean_expected


def test_fan_out_is_metadata_only_and_sized_right(spark, sf_dir):
    """fan_out must decide from driver-side file metadata (no RDD
    conversion, no job) and fan a single-split local scan out to the
    configured parallelism while leaving well-split inputs alone."""
    from kafkatoclickhouse_spark import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    # single-row-group local fixture => estimated splits is small
    est = tables._estimated_scan_splits(docs)
    assert 1 <= est < 32
    fanned = tables.fan_out(docs, parallelism=32)
    assert "Repartition" in fanned._jdf.queryExecution().logical().toString()
    # an already-wide frame (estimate >= target) is returned untouched
    assert tables.fan_out(docs, parallelism=1) is docs
    # non-file sources report 0 splits => conservative fan-out
    mem = spark.range(10)
    assert tables._estimated_scan_splits(mem) == 0


def test_parse_bytes_conf_formats():
    from kafkatoclickhouse_spark.tables import _parse_bytes

    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("4096") == 4096


def test_pq_adc_recall_and_structure(spark, sf_dir):
    """PQ retrieval sanity vs exact integer-L2 ground truth on the
    same query set: (1) ADC top-k recall@10 clears a floor — LOW by
    design on the iid-random fixture vectors (PQ exploits manifold
    correlation real embeddings have; measured 0.13 at M=4/K=8, with
    K=32 still only 0.27 — see operators/pq.py docstring), so the
    gate catches a broken index, not a detuned one; (2) every
    returned ADC distance is non-negative and ranks are consistent
    with distances; (3) the IVF-PQ composition returns a subset of
    cells' candidates with the same structural properties."""
    import numpy as np

    from kafkatoclickhouse_spark.operators import pq as PQ
    from kafkatoclickhouse_spark.tables import load_table

    em = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype=np.float64) * 1e6
        )
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(em)
    qids = sorted(k for k in ids if k % PQ.ADC_QUERY_MOD == 0)[
        : PQ.ADC_QUERY_LIMIT
    ]
    truth = {}
    for q in qids:
        ds = sorted(
            (float(((em[q] - em[n]) ** 2).sum()), n)
            for n in ids
            if n != q
        )
        truth[q] = {n for _, n in ds[: PQ.ADC_TOP_K]}

    for name in ("sim_pq_adc_topk", "sim_ivfpq_topk"):
        rows = registry.QUERIES[name](spark, sf_dir).collect()
        assert rows, name
        per_q: dict[int, list] = {}
        for r in rows:
            assert r["adc_dist_sq_micro"] >= 0
            per_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["adc_dist_sq_micro"], r["neighbor_id"])
            )
        recs = []
        for q, lst in per_q.items():
            lst.sort()
            dists = [d for _, d, _ in lst]
            assert dists == sorted(dists), f"{name} rank/dist disorder"
            recs.append(
                len({n for _, _, n in lst} & truth[q]) / len(truth[q])
            )
        assert sum(recs) / len(recs) >= 0.08, (
            f"{name} mean recall {sum(recs) / len(recs):.3f}"
        )

    # The refined path (ADC over-fetch top-C, exact integer-L2
    # re-rank — FAISS IndexRefineFlat) must be a USABLE retrieval
    # tier, not just a non-broken one: gate >= 0.5 recall@10 on the
    # same ground truth (measured 0.62/0.70 at sf0.001/0.01 with
    # C=100), and every returned distance must EQUAL the exact
    # ground-truth distance — the re-rank is exact by construction.
    rows = registry.QUERIES["sim_pq_refine_topk"](spark, sf_dir).collect()
    assert rows
    per_q = {}
    for r in rows:
        exact_d = float(((em[r["query_id"]] - em[r["neighbor_id"]]) ** 2).sum())
        assert float(r["dist_sq_micro"]) == exact_d, "refine dist not exact"
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["dist_sq_micro"], r["neighbor_id"])
        )
    recs = []
    for q, lst in per_q.items():
        lst.sort()
        dists = [d for _, d, _ in lst]
        assert dists == sorted(dists), "refine rank/dist disorder"
        recs.append(len({n for _, _, n in lst} & truth[q]) / len(truth[q]))
    mean_rec = sum(recs) / len(recs)
    assert mean_rec >= 0.5, f"refined mean recall {mean_rec:.3f} < 0.5"

    # The composed production tier (IVF prune + ADC + exact refine)
    # additionally pays for coarse-probe misses; measured 0.65 at
    # both fixture SFs (nprobe=3/8 cells) — gated at >= 0.4, still
    # far above the raw-ADC floor, and distances stay exact.
    rows = registry.QUERIES["sim_ivfpq_refine_topk"](
        spark, sf_dir
    ).collect()
    assert rows
    per_q = {}
    for r in rows:
        exact_d = float(
            ((em[r["query_id"]] - em[r["neighbor_id"]]) ** 2).sum()
        )
        assert float(r["dist_sq_micro"]) == exact_d
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recs = [len(v & truth[q]) / len(truth[q]) for q, v in per_q.items()]
    mean_rec = sum(recs) / len(recs)
    assert mean_rec >= 0.4, f"ivfpq+refine mean recall {mean_rec:.3f} < 0.4"


# -- round-9 session additions ----------------------------------------------


def test_containment_superset_of_jaccard(spark, sf_dir):
    """Every Jaccard>=0.8 pair is a containment>=0.8 pair (containment
    >= jaccard pointwise), and containment values are in (0, 1]."""
    jac = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_ngram_jaccard"](
            spark, sf_dir
        ).collect()
    }
    cont_rows = registry.QUERIES["dedup_ngram_containment"](
        spark, sf_dir
    ).collect()
    cont = {(r.doc_a, r.doc_b) for r in cont_rows}
    assert jac <= cont
    assert all(0.0 < r.containment <= 1.0 for r in cont_rows)
    assert all(r.n_shared <= r.n_smaller for r in cont_rows)


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom membership is one-sided: every true member is
    bloom-positive, so positives = members + false positives exactly;
    the bit table can't exceed k·keys or the filter width."""
    row = registry.QUERIES["agg_bloom_prefilter_join"](
        spark, sf_dir
    ).collect()[0]
    from kafkatoclickhouse_spark.operators import advanced as adv

    assert row.n_bloom_positive == row.n_true_members + row.n_false_positives
    assert row.n_bits_set <= min(
        adv.BLOOM_BITS, adv.BLOOM_HASHES * row.n_build_keys
    )
    assert row.n_true_members > 0


def test_sq8_recall_vs_bruteforce(spark, sf_dir):
    """INT8-quantized top-10 retains >=60% of the exact cosine top-10
    per query on average (4x compression; iid-noise fixture is the
    quantizer's worst case, like PQ — see operators/pq.py docstring).
    Also: every SQ8 score ties out as a bona fide BIGINT (no float)."""
    exact = registry.QUERIES["sim_topk_bruteforce"](spark, sf_dir)
    sq8 = registry.QUERIES["sim_sq8_topk"](spark, sf_dir)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in sq8.collect():
        assert isinstance(r.score_scaled, int)
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(ex)
    recalls = [
        len(ex[q] & got[q]) / len(ex[q]) for q in ex
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_gopher_gate_matches_recomputed_flags(spark, sf_dir):
    """The composite keep flag is exactly the AND of the four band
    tests, and the bands are live (both outcomes occur at sf0.01)."""
    rows = registry.QUERIES["text_gopher_rules"](spark, sf_dir).collect()
    for r in rows:
        assert r.keep == (
            r.word_count_ok
            and r.mean_word_len_ok
            and r.alpha_ratio_ok
            and r.stopwords_ok
        )
    keeps = {r.keep for r in rows}
    assert keeps == {True, False}


def test_markov_rows_are_probabilities(spark, sf_dir):
    """Per-src ppm sums land in (1e6 - n_dst, 1e6] (floor rounding
    loses < 1 ppm per destination), counts are positive, and the
    transition count total equals events minus one per user."""
    rows = registry.QUERIES["events_markov_transitions"](
        spark, sf_dir
    ).collect()
    by_src = {}
    total = 0
    for r in rows:
        assert r.n_transitions > 0
        by_src.setdefault(r.src, []).append(r.prob_ppm)
        total += r.n_transitions
    for src, ppms in by_src.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000, src
    ev = registry.QUERIES["ingest_keyed_counts"]  # noqa: F841 (anchor)
    from kafkatoclickhouse_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_running_distinct_monotone_and_bounded(spark, sf_dir):
    """distinct_so_far is per-user monotone nondecreasing in event
    order and ends at the user's exact distinct-type count."""
    df = registry.QUERIES["window_running_distinct"](spark, sf_dir)
    pdf = df.toPandas()
    from kafkatoclickhouse_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").toPandas()
    order = events.sort_values(["user_id", "ts", "event_id"])
    merged = order.merge(
        pdf, on=["user_id", "event_id", "event_type"], how="inner"
    )
    assert len(merged) == len(events)
    for uid, g in merged.groupby("user_id"):
        vals = g["distinct_types_so_far"].tolist()
        assert vals == sorted(vals)
        assert vals[-1] == g["event_type"].nunique()


def test_mmr_rerank_properties(spark, sf_dir):
    """Greedy MMR: exactly MMR_K distinct picks per query, drawn from
    the exact top-MMR_C pool; step 1 is exactly the brute-force
    rank-1 neighbor (no penalty applies to the first pick)."""
    from kafkatoclickhouse_spark.operators import similarity as sim

    rows = registry.QUERIES["sim_mmr_rerank_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.step] = r.neighbor_id
    bf = registry.QUERIES["sim_topk_bruteforce"](spark, sf_dir).collect()
    rank1 = {r.query_id: r.neighbor_id for r in bf if r.rank == 1}
    assert set(by_q) == set(rank1)
    for q, picks in by_q.items():
        assert sorted(picks) == list(range(1, sim.MMR_K + 1))
        assert len(set(picks.values())) == sim.MMR_K
        assert picks[1] == rank1[q]


def test_budget_select_is_greedy_optimal_prefix(spark, sf_dir):
    """The selection equals the greedy quality-ranked prefix: total
    tokens fit the budget, no unselected document (higher in the
    (quality desc, doc_id) order than the last pick) could have been
    added, and selected docs are exactly an order-prefix plus the
    boundary-key partial."""
    from kafkatoclickhouse_spark.operators import text as textops
    from kafkatoclickhouse_spark.functions import textfns
    from kafkatoclickhouse_spark.tables import load_table

    sel = registry.QUERIES["corpus_budget_select"](spark, sf_dir).collect()
    budget = textops.BUDGET_TOKENS
    total = sum(r.n_toks for r in sel)
    assert total <= budget
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            textfns.ws_token_count(F.col("text")).alias("n_toks"),
            F.floor(textfns.quality_score(F.col("text")) * 1_000_000)
            .cast("long")
            .alias("qm"),
        )
        .collect()
    )
    order = sorted(docs, key=lambda r: (-r.qm, r.doc_id))
    # replay the greedy selection independently
    expect, cum = set(), 0
    for r in order:
        if cum + r.n_toks <= budget:
            expect.add(r.doc_id)
            cum += r.n_toks
        else:
            break  # greedy prefix stops at the first non-fitting doc
    got = {r.doc_id for r in sel}
    assert got == expect
    assert total == cum


def test_phash_groups_consistency(spark, sf_dir):
    """Every document hashes; group_size matches the hash histogram
    exactly; and identical-pixel images (same dims and same channel
    offsets mod 256 => identical rasters) are in the same group."""
    rows = registry.QUERIES["multimodal_phash_groups"](
        spark, sf_dir
    ).collect()
    from collections import Counter

    hist = Counter(r.phash for r in rows)
    for r in rows:
        assert r.group_size == hist[r.phash]
    assert len(rows) > 0
    # structural signal: more than one group, not all singletons
    assert len(hist) > 1
    assert max(hist.values()) > 1


def test_novelty_accounting(spark, sf_dir):
    """novelty_ppm is in [0, 1e6]; the first document by id is fully
    novel by construction; and novel-shingle counts across the corpus
    sum to exactly the number of distinct shingles (each shingle is
    novel in exactly one document — its first)."""
    rows = registry.QUERIES["text_novelty_ppm"](spark, sf_dir).collect()
    assert all(0 <= r.novelty_ppm <= 1_000_000 for r in rows)
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_ppm == 1_000_000
    from kafkatoclickhouse_spark.functions import hashing
    from kafkatoclickhouse_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        docs.select(
            F.explode(
                hashing.word_shingles(F.col("text"), 3)
            ).alias("s")
        )
        .select("s")
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct


def test_containment_clusters_refine_jaccard_clusters(spark, sf_dir):
    """Containment edges are a superset of Jaccard edges, so every
    Jaccard cluster is contained within one containment cluster
    (the closure can only merge, never split)."""
    jac = {
        r.doc_id: r.cluster_id
        for r in registry.QUERIES["dedup_duplicate_clusters"](
            spark, sf_dir
        ).collect()
    }
    con = {
        r.doc_id: r.cluster_id
        for r in registry.QUERIES["dedup_containment_clusters"](
            spark, sf_dir
        ).collect()
    }
    assert set(jac) == set(con)
    # same Jaccard cluster => same containment cluster
    by_jac: dict[int, set[int]] = {}
    for d, c in jac.items():
        by_jac.setdefault(c, set()).add(con[d])
    assert all(len(v) == 1 for v in by_jac.values())


def test_semdedup_greedy_rule_exact(spark, sf_dir):
    """SemDeDup's survivor rule, recomputed independently: a vector
    is removed iff SOME lower vec_id in its k-means cell is within
    cosine SEMDEDUP_TAU — checked per vector against a numpy
    recomputation over the same cell assignment, so the Spark pair
    join can neither over- nor under-remove."""
    import numpy as np

    from kafkatoclickhouse_spark.operators.semdedup import SEMDEDUP_TAU
    from kafkatoclickhouse_spark.tables import load_table

    verdicts = {
        r.vec_id: (r.cluster, r.keep)
        for r in registry.QUERIES["dedup_semdedup"](
            spark, sf_dir
        ).collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    assert set(verdicts) == set(vecs)
    by_cell: dict[int, list[int]] = {}
    for vid, (cell, _) in sorted(verdicts.items()):
        by_cell.setdefault(cell, []).append(vid)
    for cell, ids in by_cell.items():
        for i, vid in enumerate(ids):
            v = vecs[vid]
            close = any(
                float(
                    vecs[lo] @ v
                    / (np.linalg.norm(vecs[lo]) * np.linalg.norm(v))
                )
                >= SEMDEDUP_TAU
                for lo in ids[:i]
            )
            assert verdicts[vid][1] == (not close), (cell, vid)
    # removal must actually fire on the fixture (τ chosen for that)
    assert any(not keep for _, keep in verdicts.values())


def test_mixture_quota_accounting(spark, sf_dir):
    """Mixture sampling invariants: per-source selected count equals
    the capped quota, pick ranks are a dense 1..quota prefix, quotas
    never exceed populations, and the fixture actually exercises the
    cap (some source's raw quota exceeds its population)."""
    report = {
        r.source: r
        for r in registry.QUERIES["corpus_mixture_report"](
            spark, sf_dir
        ).collect()
    }
    sample = registry.QUERIES["corpus_mixture_sample"](
        spark, sf_dir
    ).collect()
    by_src: dict[str, list[int]] = {}
    for r in sample:
        by_src.setdefault(r.source, []).append(r.pick_rank)
    for src, rep in report.items():
        assert rep.quota == min(rep.quota_raw, rep.n_docs)
        assert rep.shortfall == max(rep.quota_raw - rep.n_docs, 0)
        got = sorted(by_src.get(src, []))
        assert got == list(range(1, rep.quota + 1)), src
    assert any(rep.shortfall > 0 for rep in report.values())
    assert set(by_src) <= set(report)


def test_mixture_upsample_hits_raw_quota_exactly(spark, sf_dir):
    """Epoch-repeat upsampling emits EXACTLY quota_raw rows per
    source, epochs per document differ by at most one, and the
    fixture exercises real repetition (some epoch > 0)."""
    report = {
        r.source: r
        for r in registry.QUERIES["corpus_mixture_report"](
            spark, sf_dir
        ).collect()
    }
    rows = registry.QUERIES["corpus_mixture_upsample"](
        spark, sf_dir
    ).collect()
    per_src: dict[str, int] = {}
    per_doc: dict[tuple, int] = {}
    for r in rows:
        per_src[r.source] = per_src.get(r.source, 0) + 1
        per_doc[(r.source, r.doc_id)] = (
            per_doc.get((r.source, r.doc_id), 0) + 1
        )
    for src, rep in report.items():
        assert per_src.get(src, 0) == rep.quota_raw, src
        eps = [
            n for (s, _), n in per_doc.items() if s == src
        ]
        if eps:
            assert max(eps) - min(eps) <= 1, src
    assert any(r.epoch > 0 for r in rows)


def test_leakage_safe_split_never_straddles_pairs(spark, sf_dir):
    """Every exact-Jaccard near-dup pair lands on ONE side of the
    leakage-safe split (the property the id-hash baseline split
    violates), and the assignment is total over documents."""
    from kafkatoclickhouse_spark.operators import dedup as dedup_mod
    from kafkatoclickhouse_spark.tables import load_table

    split = {
        r.doc_id: r.split
        for r in registry.QUERIES["corpus_split_leakage_safe"](
            spark, sf_dir
        ).collect()
    }
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(split) == n_docs
    pairs = dedup_mod.ngram_jaccard_pairs(spark, sf_dir).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert split[p.doc_a] == split[p.doc_b], (p.doc_a, p.doc_b)
    assert {"train", "holdout"} == set(split.values())


def test_classifier_score_is_map_only_and_consistent(spark, sf_dir):
    """The classifier scoring plan contains NO key shuffle — every
    exchange is the fixture fan-out's round-robin repartition, which
    vanishes on a many-split real layout (tables.fan_out) — logits
    are reproducible across two invocations, and keep == (logit>=0)."""
    df = registry.QUERIES["text_classifier_score"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    rows = {r.doc_id: (r.logit_micro, r.keep) for r in df.collect()}
    again = {
        r.doc_id: (r.logit_micro, r.keep)
        for r in registry.QUERIES["text_classifier_score"](
            spark, sf_dir
        ).collect()
    }
    assert rows == again
    assert all((lg >= 0) == kp for lg, kp in rows.values())
    # both classes must occur on the fixture for the gate to mean much
    keeps = {kp for _, kp in rows.values()}
    assert keeps == {True, False}


def test_leakage_safe_split_lsh_matches_exact_twin(spark, sf_dir):
    """At fixture scale LSH recall on planted duplicates is total,
    so the production-pair-source headline split assigns every
    document the same side as the exact-pair ground-truth twin."""
    exact = {
        r.doc_id: r.split
        for r in registry.QUERIES["corpus_split_leakage_safe_exact"](
            spark, sf_dir
        ).collect()
    }
    lsh = {
        r.doc_id: r.split
        for r in registry.QUERIES["corpus_split_leakage_safe"](
            spark, sf_dir
        ).collect()
    }
    assert exact == lsh


def test_source_overlap_matrix_properties(spark, sf_dir):
    """Inter-source overlap invariants: containment ppm bounded by
    1e6, n_shared bounded by min(n_a, n_b), the pair keys are
    strictly ordered and unique, and the fixture produces a
    non-empty matrix (cross-source near-dups exist)."""
    rows = registry.QUERIES["corpus_source_overlap"](
        spark, sf_dir
    ).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0 < r.n_shared <= min(r.n_a, r.n_b)
        assert 0 < r.containment_ppm <= 1000000


def test_embedding_prep_unit_norms_and_energy(spark, sf_dir):
    """Unit-normalized outputs have L2 norm 1 within rounding, the
    MRL prefix energy ppm sits in (0, 1e6], and re-normalized
    prefixes are unit too."""
    import math

    for name, col in (
        ("embedding_normalize_unit", "unit"),
        ("embedding_truncate_mrl", "unit_prefix"),
    ):
        rows = registry.QUERIES[name](spark, sf_dir).collect()
        assert rows
        for r in rows:
            vec = r[col]
            if vec is None:
                continue
            n = math.sqrt(sum(x * x for x in vec))
            # components rounded to 1e-6 → norm within dim·1e-6 of 1
            assert abs(n - 1.0) < 1e-4, (name, r.vec_id, n)
    ppms = [
        r.energy_ppm
        for r in registry.QUERIES["embedding_truncate_mrl"](
            spark, sf_dir
        ).collect()
    ]
    assert all(0 < p <= 1000000 for p in ppms)


def test_winnowing_guarantee_and_density(spark, sf_dir):
    """The Schleimer et al. guarantee, checked against brute force:
    every document pair sharing ANY verbatim run of W+K-1 tokens
    shares at least one winnowed fingerprint hash; and the selected
    density is genuinely sparse (fewer fingerprints than k-grams)."""
    from kafkatoclickhouse_spark.operators.winnow import (
        WINNOW_K,
        WINNOW_W,
    )
    from kafkatoclickhouse_spark.tables import load_table

    g = WINNOW_W + WINNOW_K - 1
    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    grams = {
        d: {
            " ".join(t[i : i + g])
            for i in range(len(t) - g + 1)
        }
        for d, t in docs.items()
    }
    must_pair = {
        (a, b)
        for a in grams
        for b in grams
        if a < b and grams[a] & grams[b]
    }
    assert must_pair, "fixture must contain shared 8-token runs"
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["text_winnow_shared_pairs"](
            spark, sf_dir
        ).collect()
    }
    missing = must_pair - got
    assert not missing, f"guarantee violated for {sorted(missing)[:5]}"
    fp = registry.QUERIES["text_winnow_fingerprints"](
        spark, sf_dir
    ).collect()
    n_kgrams = sum(
        max(len(t) - WINNOW_K + 1, 0) for t in docs.values()
    )
    assert 0 < len(fp) < n_kgrams
