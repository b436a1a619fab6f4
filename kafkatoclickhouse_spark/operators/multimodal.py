"""Multimodal column plumbing: opaque binary payloads + typed metadata.

LLM-pipeline surface (north star). Images/audio/video are carried as
``binary`` columns with a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas over ``mapInPandas``. The
decode step itself is STUBBED (no image/audio libraries in this
container — see ``decode_image``): the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested, and
``byte_features`` extracts deterministic per-payload statistics so
the mapInPandas path has a correctness check.

Since the fixtures ship no binary columns, payloads are synthesized
deterministically from ``documents.text`` (utf-8 bytes) — the same
derivation the oracle applies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.tables import load_table

DECODERS_AVAILABLE = False  # no PIL/cv2/librosa in this environment


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct —
    the multimodal data model: payload bytes stay unparsed until a
    consumer asks; metadata is columnar and prunable."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: real deployments decode via PIL/libvips here. The
    container has no image codecs, so decoding is explicitly
    unavailable rather than silently fake."""
    raise NotImplementedError(
        "image decode requires an image codec library (e.g. PIL); "
        "not available in this environment"
    )


def _byte_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: deterministic per-payload byte statistics
    (what a real feature extractor's output shape looks like).
    Vectorized numpy over each Arrow batch."""
    import numpy as np

    for pdf in batches:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [int(a.size) for a in arrs],
                "byte_sum": [int(a.sum()) for a in arrs],
                "byte_min": [int(a.min()) if a.size else None for a in arrs],
                "byte_max": [int(a.max()) if a.size else None for a in arrs],
            }
        )


BYTE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, byte_min long, byte_max long"
)


def byte_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        _byte_feature_batches, schema=BYTE_FEATURE_SCHEMA
    )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           source AS origin
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projection off the multimodal frame — metadata
    queries never touch payload bytes (column pruning drops the
    binary column at the scan; the 100 TB point of the design)."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
    )


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(COALESCE(SUM(ascii(ch)), 0) AS BIGINT) AS byte_sum,
           CAST(MIN(ascii(ch)) AS BIGINT) AS byte_min,
           CAST(MAX(ascii(ch)) AS BIGINT) AS byte_max
    FROM (SELECT doc_id, text, unnest(string_split(text, '')) AS ch
          FROM documents)
    GROUP BY doc_id, text
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads
    (deterministic byte statistics; pytest additionally pins exact
    values on a known payload). The oracle recomputes the stats
    per-character over the source text — identical to the byte path
    because the fixture text is pure ASCII (char code == payload
    byte), the same technique as ``multimodal_resize``."""
    docs = load_table(spark, sf_dir, "documents")
    return byte_features(with_binary_payload(docs))


# -- frame sampling ---------------------------------------------------------
#
# Video-style payload access: treat the binary column as a sequence of
# fixed-size frames and keep every STRIDE-th one. Pure codegen'd
# expressions (sequence → transform → explode over binary substr) — at
# 100 TB this is a map-only stage whose output is 1/STRIDE of the
# payload bytes; no Python, no shuffle.

FRAME_BYTES = 256
FRAME_STRIDE = 4  # keep frames 0, 4, 8, …


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           md5(substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER),
               {FRAME_BYTES})) AS frame_md5,
           CAST(length(substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER),
               {FRAME_BYTES})) AS INTEGER) AS frame_len
    FROM documents,
         (SELECT unnest(range(0, 10000, {FRAME_STRIDE})) AS i)
    WHERE i * {FRAME_BYTES} < length(text)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ``FRAME_STRIDE``-th fixed-size frame of each payload,
    emitted as (doc_id, frame_idx, frame md5, frame length). Frames
    are sliced from the BINARY payload; the oracle slices the source
    text — identical because the fixture text is pure ASCII (verified:
    0 multi-byte docs), which is what makes the binary path
    hash-checkable at all."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    n_frames = F.ceil(
        F.col("meta.n_bytes").cast("double") / FRAME_BYTES
    ).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % FRAME_STRIDE == 0,
    )
    frame = F.expr(
        f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})"
    )
    return (
        mm.select("doc_id", "payload", F.explode(idx).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.md5(frame).alias("frame_md5"),
            F.length(frame).cast("int").alias("frame_len"),
        )
    )


# -- resize (stub kernel, real plumbing) ------------------------------------

RESIZE_TO = 64  # output "pixels" per payload


def _resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel shaped like a real image resize: fixed-size
    output per payload. The interpolation a codec library would do is
    STUBBED with deterministic strided byte selection (container has
    no PIL/cv2 — see ``decode_image``); batch shape, Arrow transfer
    and output schema are exactly what the real kernel uses.

    Index selection is pure integer arithmetic —
    ``pos_i = i*(n-1) // (RESIZE_TO-1)`` — so the exact same positions
    are reproducible in any engine (the DuckDB oracle recomputes them
    with integer division; float ``linspace`` would not hash-match)."""
    import numpy as np

    steps = None
    for pdf in batches:
        if steps is None:
            steps = np.arange(RESIZE_TO, dtype=np.int64)
        out = []
        for b in pdf["payload"]:
            a = np.frombuffer(b, dtype=np.uint8)
            if a.size == 0:
                out.append([0] * RESIZE_TO)
                continue
            idx = steps * (a.size - 1) // (RESIZE_TO - 1)
            out.append(a[idx].astype(np.int32).tolist())
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "resized": out}
        )


def resize(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched fixed-size resample over the binary column;
    returns the raw ``array<int>`` pixels (internal use + pytest)."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        _resize_batches, schema="doc_id long, resized array<int>"
    )


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT d.doc_id,
           string_agg(
               CAST(CASE WHEN strlen(d.text) = 0 THEN 0
                    ELSE ascii(substring(d.text,
                         CAST((g.i * (strlen(d.text) - 1))
                              // {RESIZE_TO - 1} AS INTEGER) + 1, 1))
               END AS VARCHAR), ',' ORDER BY g.i) AS resized_csv
    FROM documents d,
         (SELECT unnest(range(0, {RESIZE_TO})) AS i) g
    GROUP BY d.doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size resample of every payload via the Arrow-batched
    resize kernel; pytest pins the raw array on a known payload.

    The registered form joins the pixel array into one csv string —
    drivers canonicalize rows by sorting/hashing values, and a raw
    ``array<int>`` column is unhashable there. The oracle recomputes
    the integer-stride byte selection directly over the source text
    (pure ASCII fixture, so char code == payload byte)."""
    docs = load_table(spark, sf_dir, "documents")
    px = resize(with_binary_payload(docs))
    return px.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("resized", lambda x: x.cast("string"))
        ).alias("resized_csv"),
    )


# -- frame energy (audio-style windowed features) ---------------------------


def _frame_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel shaped like audio feature extraction:
    per-frame energy (sum of squared samples) over fixed-size windows
    of the payload. Integer arithmetic end-to-end so the statistics
    are exact in any engine."""
    import numpy as np

    for pdf in batches:
        doc_ids, idxs, sums, ns = [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            for i in range(0, max(len(a), 1), FRAME_BYTES):
                fr = a[i : i + FRAME_BYTES]
                doc_ids.append(doc_id)
                idxs.append(i // FRAME_BYTES)
                sums.append(int((fr * fr).sum()))
                ns.append(int(fr.size))
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "frame_idx": idxs,
                "energy": sums,
                "n_samples": ns,
            }
        )


@query(
    "multimodal_frame_energy",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             substring(text, CAST(i * {FRAME_BYTES} + 1 AS INTEGER),
                       {FRAME_BYTES}) AS fr
      FROM documents,
           (SELECT unnest(range(0, 10000)) AS i)
      WHERE i * {FRAME_BYTES} < length(text) OR (i = 0)
    ),
    chars AS (
      SELECT doc_id, frame_idx,
             unnest(string_split(fr, '')) AS ch
      FROM frames
    )
    SELECT f.doc_id, f.frame_idx,
           CAST(COALESCE(SUM(ascii(c.ch) * ascii(c.ch)), 0) AS BIGINT)
             AS energy,
           CAST(length(f.fr) AS BIGINT) AS n_samples
    FROM frames f
    LEFT JOIN chars c USING (doc_id, frame_idx)
    GROUP BY f.doc_id, f.frame_idx, f.fr
    """,
)
def multimodal_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed feature extraction over binary payloads:
    per-frame energy = Σ sample² over fixed 256-byte windows, exact
    integer arithmetic (the deterministic stand-in for the stubbed
    codec's RMS/spectral kernels — see ``decode_image`` for the stub
    policy). Arrow-batched mapInPandas: map-only, output ≤ 1 row per
    frame, no shuffle; the oracle recomputes per-char over the ASCII
    fixture like ``multimodal_byte_features``. Empty payloads emit a
    single (frame 0, energy 0, n 0) row so every document is
    accounted for."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.select("doc_id", "payload").mapInPandas(
        _frame_energy_batches,
        schema="doc_id long, frame_idx long, energy long, n_samples long",
    )
