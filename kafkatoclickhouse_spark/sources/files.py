"""File-format readers/writers with schema-preserving round-trips.

Parquet is the engine's at-rest format (columnar, splittable,
predicate-pushdown — the only sane choice at 100 TB); CSV and JSON
are interchange formats. The reader API pins the behaviors that bite
in production:

- CSV: explicit schema required (inference reads the data twice and
  guesses types — never acceptable on a 100 TB path); header on;
  ISO-8601 timestamps.
- JSON: lines format (splittable — a single JSON array is not);
  explicit schema for the same reason.
- Parquet: schema comes from the footer; passing one anyway enables
  schema-on-read projection.
- ORC: same columnar/pushdown properties as parquet (footer schema,
  predicate pushdown, splittable) — supported for interop with
  Hive-era warehouses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt`` (parquet | csv | json)."""
    reader = spark.read
    if fmt == "csv":
        if schema is None:
            raise ValueError("CSV requires an explicit schema")
        reader = reader.option("header", "true").option(
            "timestampFormat", TS_FMT
        )
    elif fmt == "json":
        if schema is None:
            raise ValueError("JSON requires an explicit schema")
        reader = reader.option("timestampFormat", TS_FMT)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format: {fmt}")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    """Write ``df`` to ``path`` as ``fmt``; ``partition_by`` produces
    hive-style directory partitioning (the partition-pruning handle
    for selective reads at scale)."""
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", TS_FMT
        )
    elif fmt == "json":
        writer = writer.option("timestampFormat", TS_FMT)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format: {fmt}")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
) -> None:
    """Write parquet range-clustered on ``cluster_col``: rows are
    range-partitioned (sampled split points) and sorted within each
    file, so every file — and every row group inside it — covers a
    narrow, non-overlapping value range. Point/range predicates on
    the cluster column then skip whole files via footer min/max stats
    before any row is read: the lightweight cousin of Hive-style
    directory partitioning, right when the column is too
    high-cardinality to be a directory key (ids, timestamps). The
    cost is one range-exchange at write time."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-bucketed)
    catalog table: rows are hash-distributed into ``n_buckets`` files
    per partition on ``bucket_cols``, and the bucketing is recorded
    in the table metadata.

    This is the pre-shuffle pattern for repeated big joins: two
    tables bucketed on the same key with the same bucket count join
    with NO exchange on either side (and with ``sort_cols`` set, no
    sort either) — the shuffle is paid once at write time instead of
    on every query. At 100 TB pick n_buckets so one bucket of the
    larger table fits an executor's memory; both sides must use the
    SAME count or Spark shuffles the mismatched side anyway.
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: tuple[str, ...] = (),
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    roughly ``target_file_bytes`` each; returns the output file count.

    Streaming sinks and fine-grained partitioned writes accumulate
    thousands of small files; at 100 TB an uncompacted table turns
    every scan into a file-listing + footer-reading storm and starves
    the scheduler with one-split tasks. Sizing: output file count =
    ceil(on-disk bytes / target). ``coalesce`` (not ``repartition``)
    merges splits WITHOUT a shuffle — each output task reads a few
    whole input files. With ``sort_within_by`` an in-file sort (one
    shuffle-free sortWithinPartitions) restores footer min/max
    clustering so file skipping keeps working after compaction.
    """
    import math

    from pathlib import Path

    on_disk = sum(
        f.stat().st_size
        for f in Path(src_path).rglob("*.parquet")
        if f.is_file()
    )
    n_files = max(1, math.ceil(on_disk / target_file_bytes))
    df = spark.read.parquet(src_path).coalesce(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(dst_path)
    return len(
        [f for f in Path(dst_path).rglob("*.parquet") if f.is_file()]
    )


def apply_upserts(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    version_col: str,
    dst_path: str,
) -> None:
    """CDC-style merge onto a parquet table without a lakehouse
    format: latest ``version_col`` per ``key_cols`` wins across
    base ∪ updates, written to ``dst_path`` (write-ahead-then-swap
    beats in-place for plain parquet — the read side never sees a
    partial MERGE).

    Plan shape: one union (no shuffle) + one hash exchange on the
    key for the row_number dedup — the same cost as the shuffle a
    real MERGE pays. Deterministic tie-break: at equal version the
    update wins (``_src`` ordering), so replays are idempotent —
    the ReplacingMergeTree semantics the reference's sink table
    relies on (SURVEY §4.3), done engine-side.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    base = spark.read.parquet(base_path).withColumn("_src", F.lit(0))
    upd = updates.withColumn("_src", F.lit(1))
    w = W.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    merged = (
        base.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    merged.write.mode("overwrite").parquet(dst_path)


def cdc_merge_plan(
    base: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    version_col: str,
    deleted_col: str,
) -> DataFrame:
    """The CDC merge as a pure DataFrame plan (shared by
    :func:`apply_cdc_batch` and the registered/benchable
    ``cdc_apply_batch_merge`` query): newest version per key wins,
    tombstone beats upsert at equal version, whole-row hash breaks
    the remaining ties — deterministic and batching-independent (see
    :func:`apply_cdc_batch`). One key-hash exchange."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    chg = changes.withColumn(
        deleted_col, F.coalesce(F.col(deleted_col), F.lit(False))
    )
    if deleted_col not in base.columns:
        base = base.withColumn(deleted_col, F.lit(False))
    all_cols = chg.columns
    w = W.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.col(deleted_col).desc(),
        F.xxhash64(F.struct(*all_cols)).desc(),
    )
    return (
        base.select(*all_cols)
        .unionByName(chg.select(*all_cols))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc_batch(
    spark: SparkSession,
    base_path: str,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    version_col: str,
    deleted_col: str,
    dst_path: str,
) -> None:
    """CDC merge WITH tombstones: like :func:`apply_upserts`, but
    ``changes`` rows flagged true in ``deleted_col`` are delete
    records (the Debezium ``op='d'`` / ReplacingMergeTree
    ``is_deleted`` contract).

    Tombstones are PERSISTED in the output table (``deleted_col``
    stays a column; :func:`read_cdc_table` is the live view that
    filters them) rather than physically dropped — dropping them
    would let a stale lower-version upsert in a LATER batch
    resurrect a deleted key, because nothing would remain to outrank
    it (review finding). With the tombstone stored, late stale
    upserts lose to it under the same version rule in every future
    merge, so the result is order-independent across batches;
    compaction may physically drop tombstones once the feed's
    out-of-orderness horizon has passed.

    Missing ``base_path`` bootstraps from an empty base (first batch
    of a fresh table). Ties are fully deterministic AND
    batching-independent: newest version wins; at equal version a
    tombstone beats an upsert (conservative), then a whole-row-hash
    tiebreak orders distinct payloads. Batch provenance (``_src``)
    deliberately does NOT participate in the ordering — if it did,
    two conflicting equal-version upserts would resolve differently
    depending on whether they arrived in one batch (hash decides) or
    two (later batch wins), breaking the order-independence claim
    (review finding). A replayed batch re-presents rows identical to
    what the base already holds, so the hash tie is between equal
    payloads and converges either way. One key-hash exchange, as
    before."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    chg = changes.withColumn(
        deleted_col, F.coalesce(F.col(deleted_col), F.lit(False))
    )
    try:
        base = spark.read.parquet(base_path)
    except AnalysisException:
        base = spark.createDataFrame([], chg.schema)
    merged = cdc_merge_plan(
        base, chg, key_cols, version_col, deleted_col
    )
    merged.write.mode("overwrite").parquet(dst_path)


def read_cdc_table(
    spark: SparkSession, path: str, deleted_col: str
) -> DataFrame:
    """The LIVE view of a CDC-merged table: rows whose newest record
    is not a tombstone, with the tombstone column projected away.
    Readers use this; the stored table keeps tombstones so late
    stale upserts can never resurrect a deleted key."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    return df.filter(~F.col(deleted_col)).drop(deleted_col)


ZORDER_BITS = 16


def zorder_value(a, b, bits: int = ZORDER_BITS):
    """Interleave the low ``bits`` bits of two non-negative int
    columns into one Morton (Z-order) key — pure bit expressions,
    whole-stage codegen, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(
                F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i,
            )
            + F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    quantile_buckets: int = 0,
) -> None:
    """Write parquet Z-order-clustered on TWO columns — the
    multi-dimensional generalization of ``write_range_clustered``
    (Delta's OPTIMIZE ZORDER, engine-side): each column is mapped to
    a 16-bit bucket id, the two ids interleave into a Morton key,
    and files are range-partitioned + sorted on that key. Because Z-order preserves locality in BOTH dimensions,
    footer min/max stats stay narrow for col_a AND col_b — a
    predicate on EITHER column skips most files, where single-column
    range clustering helps only its own column.

    Buckets are equi-width over each column's [min, max] — the
    min/max pair is ONE tiny aggregate collected as four scalars
    (the same K-scalars driver sync k-means uses), and the bucket +
    Morton computation is then pure map-side: no global window, no
    single-partition sort, nothing that chokes at 100 TB.

    Heavy value skew concentrates equi-width bucket ids and costs
    skipping selectivity (the write-path scale curve measured 0%
    value-side pruning on the exponential ``events.value`` at 8
    files). ``quantile_buckets = B`` (power of two, e.g. 64) fixes
    it WITHOUT the full per-dimension sort rank-bucketing needs:
    one ``approx_percentile`` agg returns B-1 boundaries per
    dimension as driver scalars, and each row's bucket is a
    searchsorted over that broadcast literal array
    (``size(filter(boundaries, b -> b <= x))`` — a higher-order
    function, vectorized JVM-side, O(B) per row). Equal mass per
    bucket regardless of distribution; same single range exchange.

    Cost at write time: one scalar agg + one range exchange on the
    Morton key — amortized over every subsequent selective read,
    the same trade Delta/Iceberg make."""
    from pyspark.sql import functions as F

    if quantile_buckets:
        if quantile_buckets < 2 or quantile_buckets & (quantile_buckets - 1):
            raise ValueError(
                "quantile_buckets must be a power of two >= 2, got "
                f"{quantile_buckets}: 1 yields an empty percentile "
                "list, and a non-power-of-two wastes interleave bits "
                "and misaligns the two Morton dimensions"
            )
        bits = max(1, (quantile_buckets - 1).bit_length())

        def boundaries(col):
            qs = [i / quantile_buckets for i in range(1, quantile_buckets)]
            row = df.agg(
                F.percentile_approx(
                    F.col(col).cast("double"), qs, 10_000
                )
            ).collect()[0][0]
            return row

        bnd_a, bnd_b = boundaries(col_a), boundaries(col_b)
        if bnd_a is None or bnd_b is None:
            df.write.mode("overwrite").parquet(path)
            return

        def bucket(col, bnd):
            arr = F.array(*[F.lit(float(v)) for v in bnd])
            x = F.col(col).cast("double")
            return F.size(F.filter(arr, lambda b: b <= x)).cast("long")

        ra, rb = bucket(col_a, bnd_a), bucket(col_b, bnd_b)
        zed = df.withColumn("_z", zorder_value(ra, rb, bits))
    else:
        buckets = 1 << ZORDER_BITS
        lo_a, hi_a, lo_b, hi_b = df.agg(
            F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
        ).collect()[0]
        if lo_a is None or lo_b is None:
            # empty input: write the empty table like the plain
            # writers instead of float(None)-crashing in bucket math.
            df.write.mode("overwrite").parquet(path)
            return

        def bucket(col, lo, hi):
            span = float(hi) - float(lo)
            if span <= 0:
                return F.lit(0).cast("long")
            return F.least(
                F.lit(buckets - 1),
                F.floor(
                    (F.col(col).cast("double") - F.lit(float(lo)))
                    * F.lit(float(buckets))
                    / F.lit(span + 1e-9)
                ).cast("long"),
            )

        ra = bucket(col_a, lo_a, hi_a)
        rb = bucket(col_b, lo_b, hi_b)
        zed = df.withColumn("_z", zorder_value(ra, rb))
    (
        zed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
