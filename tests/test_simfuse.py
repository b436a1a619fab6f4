"""Equivalence harness for the round-15 fused sim_* kernels
(VERDICT r14 #1): every fused ``mapInArrow`` retrieval path must be
ROW-IDENTICAL — bit-for-bit on doubles, null-for-null — to the
retained pre-r15 Catalyst builder it replaced, both on the real
fixture and on an adversarial corpus built to hit the edge cases the
fixture cannot: zero vectors (NULL-cosine branches), a zero-vector
QUERY and a zero-vector CENTROID, exact duplicate vectors (score
ties broken by id), and vectors equal to centroids."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafkatoclickhouse_spark.operators import pq as PQ
from kafkatoclickhouse_spark.operators import similarity as SIM

PAIRS = [
    ("sim_ivf_topk", SIM._catalyst_sim_ivf_topk),
    ("sim_ivf_sq8_topk", SIM._catalyst_sim_ivf_sq8_topk),
    ("sim_ivf_sq8_refine_topk", SIM._catalyst_sim_ivf_sq8_refine_topk),
    ("sim_ivf_filtered_topk", SIM._catalyst_sim_ivf_filtered_topk),
    (
        "sim_ivf_appended_serve_topk",
        SIM._catalyst_sim_ivf_appended_serve_topk,
    ),
    ("sim_ivfpq_topk", PQ._catalyst_sim_ivfpq_topk),
    ("sim_ivfpq_refine_topk", PQ._catalyst_sim_ivfpq_refine_topk),
    ("sim_ivfpq_serve_topk", PQ._catalyst_sim_ivfpq_serve_topk),
    ("sim_pq_refine_topk", PQ._catalyst_sim_pq_refine_topk),
]

# Queries that read persisted index artifacts keyed on the fixture
# fingerprint — exercised on the real fixture only (their scoring
# kernels are shared with the inline variants, which DO run on the
# adversarial corpus).
PERSISTED = {"sim_ivf_appended_serve_topk", "sim_ivfpq_serve_topk"}


def _bits(v):
    """Hashable exact representation: doubles by bit pattern (so
    0.1+0.2 != 0.3 and -0.0 != 0.0 — stricter than the oracle),
    everything else as-is."""
    if isinstance(v, float):
        return struct.pack("<d", v)
    return v


def _canon(df):
    return sorted(
        tuple(_bits(v) for v in row) for row in df.collect()
    )


def _assert_identical(fused_df, cat_df, name):
    assert fused_df.columns == cat_df.columns, name
    assert [f.dataType for f in fused_df.schema.fields] == [
        f.dataType for f in cat_df.schema.fields
    ], name
    f_rows, c_rows = _canon(fused_df), _canon(cat_df)
    assert f_rows == c_rows, (
        f"{name}: fused != catalyst "
        f"({len(f_rows)} vs {len(c_rows)} rows; first diff: "
        f"{next((a, b) for a, b in zip(f_rows, c_rows) if a != b) if len(f_rows) == len(c_rows) else '(row count)'})"
    )


@pytest.mark.parametrize("name,catalyst", PAIRS, ids=[p[0] for p in PAIRS])
def test_fused_matches_catalyst_on_fixture(spark, sf_dir, name, catalyst):
    from kafkatoclickhouse_spark import registry

    _assert_identical(
        registry.QUERIES[name](spark, sf_dir), catalyst(spark, sf_dir), name
    )


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    """A 130-vector embeddings fixture engineered for edge cases:

    - vec_id 0 is the ZERO vector and is also a query (vec_id%100==0
      and %97==0) → every fused NULL-guard (query norm 0) fires;
    - vec_id 7 is a zero CENTROID (first 16 ids are IVF centroids)
      → a whole cell whose centroid similarity is NULL for all rows;
    - vec_ids 30..39 are exact duplicates → score ties broken by
      neighbor_id in every tier, including the SQ8/PQ integer ties;
    - vec_ids 40..55 equal centroids 0..15 → distance-0 assignment
      ties and self-vs-copy disambiguation;
    - the rest is seeded uniform noise in [-1, 1).
    """
    rng = np.random.RandomState(42)
    n, dim = 130, 64
    V = (rng.rand(n, dim).astype(np.float32) * 2.0 - 1.0).astype(
        np.float32
    )
    V[0] = 0.0
    V[7] = 0.0
    V[30:40] = V[29]
    V[40:56] = V[:16]
    labels = (np.arange(n) % 5).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, row)) for row in V],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels),
        }
    )
    d = tmp_path_factory.mktemp("simfuse_adv")
    pq.write_table(t, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name,catalyst",
    [p for p in PAIRS if p[0] not in PERSISTED],
    ids=[p[0] for p in PAIRS if p[0] not in PERSISTED],
)
def test_fused_matches_catalyst_adversarial(
    spark, adversarial_dir, name, catalyst
):
    from kafkatoclickhouse_spark import registry

    fused = registry.QUERIES[name](spark, adversarial_dir)
    cat = catalyst(spark, adversarial_dir)
    _assert_identical(fused, cat, f"{name}[adversarial]")
    # sanity: the adversarial corpus actually produces rows
    assert fused.count() > 0, name
