"""Streaming decontamination ([EXT] — LLM-pipeline surface on the
streaming side; SURVEY §2.2).

The batch operator (`operators/decontam.py`) scores a corpus at
rest; ingest pipelines also want the same verdict ON THE WAY IN, so
a contaminated document never lands in the training store at all.
Because the held-out set is static and tiny (benchmarks are MBs),
the streaming form needs NO state, watermark, or aggregation: the
eval shingle set rides a broadcast as one collected array and each
arriving document is flagged map-side with an ``arrays_overlap``
against its own row-local shingles — an append-mode pass-through
whose per-record cost is O(shingles · log |eval|).

At production scale the collected set becomes a Bloom filter or a
sorted hash array built once per eval release; the stream plan —
stream-static broadcast + row-local membership probe — is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.functions import hashing
from kafkatoclickhouse_spark.operators.decontam import DECONTAM_N


def streaming_decontaminate(
    docs_stream: DataFrame, eval_shingles: DataFrame
) -> DataFrame:
    """Append-mode flagging of a document stream against a static
    eval-shingle relation (one ``shingle`` column). Adds a
    ``contaminated`` boolean; no state, no shuffle on the stream
    side."""
    evals = eval_shingles.agg(
        F.collect_set("shingle").alias("eval_set")
    )
    sh = hashing.word_shingles(F.col("text"), DECONTAM_N)
    return (
        docs_stream.withColumn("shingles", sh)
        .crossJoin(F.broadcast(evals))
        .withColumn(
            # coalesce: a NULL text column yields NULL shingles and a
            # NULL overlap; batch semantics (explode drops such docs)
            # treat them as not contaminated, so the flag must be a
            # TOTAL boolean here too.
            "contaminated",
            F.coalesce(
                F.arrays_overlap(F.col("shingles"), F.col("eval_set")),
                F.lit(False),
            ),
        )
        .drop("shingles", "eval_set")
    )


# -- Bloom-gated variant (VERDICT r13 #6) ------------------------------------
#
# The r13 per-stage measurement named decontamination the heaviest
# curation stage: `arrays_overlap` against the full eval array
# re-materializes an |eval|-sized probe per ROW, so per-doc cost is
# O(|eval| + shingles). The production swap the measurement named:
# probe a BIT MASK first. The eval set's shingles hash (JVM-native
# xxhash64 — no md5 hex round-trip; the mask never needs oracle
# replay because the EXACT verify below is what decides) into a
# BLOOM_STREAM_BITS-bit Bloom filter shipped as one array<bigint>
# literal; each arriving doc keeps only its bloom-positive shingles
# (k cheap hashes per shingle, row-local), and the exact
# arrays_overlap verify runs ONLY on docs with a surviving shingle.
# Bloom filters have no false negatives, so verdicts are
# row-identical to the exact gate by construction (pinned in
# tests/test_streaming.py); false positives cost one exact probe
# and are surfaced by ``bloom_candidate``.

BLOOM_STREAM_BITS = 1 << 17  # 131072 bits = 2048 longs as a literal
BLOOM_STREAM_SEED = 42
# Kirsch–Mitzenmacher: k bit positions are SLICES of one 64-bit
# xxhash (h >> shift, masked) — ONE hash per shingle instead of k,
# all remaining probe math pure bit ops. 17-bit positions at shifts
# 0/17/34 stay inside the 64-bit word.
BLOOM_STREAM_SHIFTS = (0, 17, 34)


def _bit_test(h: str, shift: int) -> str:
    word = (
        f"CAST(shiftright({h}, {shift + 6})"
        f" & {BLOOM_STREAM_BITS // 64 - 1} AS INT) + 1"
    )
    bit = f"CAST(shiftright({h}, {shift}) & 63 AS INT)"
    return (
        f"(shiftright(element_at(__bloom, {word}), {bit}) & 1) = 1"
    )


def eval_bloom_mask(eval_shingles: DataFrame) -> list[int]:
    """Build the bit mask ONCE per eval release: bit positions per
    shingle computed JVM-side (the same two-level hash rule the
    probe uses — per-token string hash once, then a multi-arg
    xxhash64 over the DECONTAM_N token-hash longs; NULL slots of
    short shingles are skipped identically on both sides), OR-ed
    into BLOOM_STREAM_BITS/64 longs driver-side (a bounded barrier —
    ≤ k·|eval| narrow rows, benchmarks are MBs)."""
    th = F.transform(
        F.split(F.col("shingle"), " "),
        lambda t: F.xxhash64(F.lit(BLOOM_STREAM_SEED), t),
    )
    h = F.xxhash64(
        F.lit(BLOOM_STREAM_SEED),
        *[F.element_at(th, i + 1) for i in range(DECONTAM_N)],
    )
    bits = (
        eval_shingles.select(
            F.explode(
                F.array(
                    *[
                        F.shiftright(h, sh).bitwiseAND(
                            F.lit(BLOOM_STREAM_BITS - 1)
                        )
                        for sh in BLOOM_STREAM_SHIFTS
                    ]
                )
            ).alias("bit")
        )
        .distinct()
        .collect()
    )
    mask = [0] * (BLOOM_STREAM_BITS // 64)
    for r in bits:
        b = int(r["bit"])
        mask[b // 64] |= 1 << (b % 64)
    # map to signed int64 for the Spark literal
    return [m - (1 << 64) if m >= (1 << 63) else m for m in mask]


def streaming_decontaminate_bloom(
    docs_stream: DataFrame, eval_shingles: DataFrame
) -> DataFrame:
    """Append-mode Bloom-gated decontamination: same ``contaminated``
    verdict as :func:`streaming_decontaminate`, plus
    ``bloom_candidate`` (the docs that paid an exact probe — its
    rate over contaminated docs is the filter's measured false-
    positive overhead). No state, no shuffle on the stream side.

    Probe cost per shingle position: DECONTAM_N element_at lookups,
    ONE multi-arg xxhash64 (tokens fold into the hash with no
    concatenated shingle STRING — the string allocations are what
    dominated the exact gate's per-doc cost), bit ops, three
    element_at mask probes. Clean docs never materialize a shingle;
    only bloom-candidate docs build the shingle array and pay the
    exact |eval|-set overlap probe."""
    mask = eval_bloom_mask(eval_shingles)
    evals = eval_shingles.agg(
        F.collect_set("shingle").alias("eval_set")
    )
    test = " AND ".join(
        _bit_test("h", sh) for sh in BLOOM_STREAM_SHIFTS
    )
    parts = ", ".join(
        f"element_at(__th, i + {k + 1})" for k in range(DECONTAM_N)
    )
    hashes = (
        f"transform(sequence(0, greatest(size(__th) - {DECONTAM_N},"
        f" 0)), i -> xxhash64({BLOOM_STREAM_SEED}, {parts}))"
    )
    sh = hashing.word_shingles(F.col("text"), DECONTAM_N)
    return (
        docs_stream.withColumn(
            "__th",
            F.transform(
                hashing.tokens(F.col("text")),
                lambda t: F.xxhash64(F.lit(BLOOM_STREAM_SEED), t),
            ),
        )
        .withColumn("__bloom", F.lit(mask).cast("array<bigint>"))
        .withColumn(
            "bloom_candidate",
            F.coalesce(
                F.expr(f"exists({hashes}, h -> {test})"),
                F.lit(False),
            ),
        )
        .crossJoin(F.broadcast(evals))
        .withColumn(
            "contaminated",
            F.when(
                F.col("bloom_candidate"),
                F.coalesce(
                    F.arrays_overlap(sh, F.col("eval_set")),
                    F.lit(False),
                ),
            ).otherwise(F.lit(False)),
        )
        .drop("__th", "__bloom", "eval_set")
    )
