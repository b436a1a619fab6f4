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
