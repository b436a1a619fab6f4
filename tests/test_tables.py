"""Scan-layer timestamp normalization: the fixture generator has
shipped ``events.ts`` as parquet TIMESTAMP(NANOS)-as-long (rounds
1-4) and as µs TIMESTAMP_NTZ (round 5+). ``load_table`` must converge
every encoding to a session-zone TIMESTAMP so the event-time surface
(``unix_micros``, ``withWatermark``, ``window``) works regardless of
which writer produced the parquet — the round-5 regression pinned
here killed three queries and every streaming smoke."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkatoclickhouse_spark import tables

ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0, 123456)),
    (2, dt.datetime(2024, 6, 15, 12, 30, 45, 999999)),
    (3, dt.datetime(2025, 12, 31, 23, 59, 59, 1)),
]
def _expected_micros():
    out = []
    for _, ts in ROWS:
        epoch = dt.datetime(1970, 1, 1)
        out.append(int((ts - epoch) / dt.timedelta(microseconds=1)))
    return out


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    """Write a minimal events.parquet with the given ts encoding."""
    sf_dir = os.path.join(tmpdir)
    table = pa.table(
        {
            "event_id": pa.array([i for i, _ in ROWS], pa.int64()),
            "ts": ts_array,
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize(
    "encoding",
    ["us_ntz", "ns", "us_utc"],
    ids=["timestamp[us] (NTZ)", "timestamp[ns] (nanosAsLong)", "timestamp[us, UTC]"],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, encoding):
    py_ts = [ts for _, ts in ROWS]
    if encoding == "us_ntz":
        arr = pa.array(py_ts, pa.timestamp("us"))
    elif encoding == "ns":
        arr = pa.array(py_ts, pa.timestamp("ns"))
    else:
        arr = pa.array(py_ts, pa.timestamp("us", tz="UTC"))
    sf_dir = _write_events(str(tmp_path), arr)

    df = tables.load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{encoding}: ts must normalize to TIMESTAMP, got "
        f"{df.schema['ts'].dataType}"
    )
    got = [
        r["us"]
        for r in df.orderBy("event_id")
        .select(F.unix_micros("ts").alias("us"))
        .collect()
    ]
    assert got == _expected_micros(), encoding
    # the event-time surface must accept the column
    df.withWatermark("ts", "1 minute")


def test_normalize_timestamps_leaves_non_ntz_untouched(spark):
    df = spark.createDataFrame(
        [(1, "a")], T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("s", T.StringType()),
            ]
        )
    )
    out = tables.normalize_timestamps(df)
    assert out.schema == df.schema
    assert out is df  # no-op: no projection added when nothing to do


# -- micros(): total over both wall-time types ------------------------------


@pytest.mark.parametrize("dtype", ["timestamp", "timestamp_ntz"])
def test_micros_accepts_both_timestamp_types(spark, dtype):
    """functions.exact.micros is the one door for wall-time → integer
    microseconds; it must be total over TIMESTAMP and TIMESTAMP_NTZ
    (F.unix_micros alone raises DATATYPE_MISMATCH on NTZ — the exact
    r5 regression). Under the pinned UTC session zone both types must
    yield identical integers."""
    from kafkatoclickhouse_spark.functions.exact import micros

    df = spark.createDataFrame(
        [(i, ts) for i, ts in ROWS], ["event_id", "ts"]
    ).withColumn("ts", F.col("ts").cast(dtype))
    got = [
        r["us"]
        for r in df.orderBy("event_id").select(micros("ts").alias("us")).collect()
    ]
    assert got == _expected_micros(), dtype


# -- fixture-drift canary ---------------------------------------------------
#
# VERDICT r5: a silent fixture re-encode cost sixteen downstream test
# failures. This canary pins the *loaded* dtype of every fixture column
# so the next driver-side regeneration fails ONE named test instead.

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

EXPECTED_SCHEMAS = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"),
               ("n_regionkey", "int")],
    "customer": [("c_custkey", "bigint"), ("c_name", "string"),
                 ("c_nationkey", "int"), ("c_acctbal", "double"),
                 ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "bigint"), ("s_name", "string"),
                 ("s_nationkey", "int"), ("s_acctbal", "double")],
    "part": [("p_partkey", "bigint"), ("p_name", "string"),
             ("p_brand", "string"), ("p_type", "string"),
             ("p_size", "int"), ("p_retailprice", "double")],
    "orders": [("o_orderkey", "bigint"), ("o_custkey", "bigint"),
               ("o_orderstatus", "string"), ("o_totalprice", "double"),
               ("o_orderdate", "timestamp"), ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "bigint"), ("l_partkey", "bigint"),
                 ("l_suppkey", "bigint"), ("l_linenumber", "int"),
                 ("l_quantity", "double"), ("l_extendedprice", "double"),
                 ("l_discount", "double"), ("l_tax", "double"),
                 ("l_returnflag", "string"), ("l_linestatus", "string"),
                 ("l_shipdate", "timestamp")],
    "events": [("event_id", "bigint"), ("ts", "timestamp"),
               ("user_id", "bigint"), ("event_type", "string"),
               ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "bigint"), ("text", "string"),
                  ("lang", "string"), ("source", "string"),
                  ("n_chars", "bigint")],
    "embeddings": [("vec_id", "bigint"), ("embedding", "array<float>"),
                   ("label", "int")],
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixtures absent")
@pytest.mark.parametrize("table", sorted(EXPECTED_SCHEMAS))
def test_fixture_dtype_canary(spark, table):
    """Pin the post-load dtype of every fixture column. Timestamps must
    land as session-zone TIMESTAMP whatever the parquet encoding;
    embeddings stay array<float> (the similarity stack's Arrow kernels
    assume float32); money/measure columns stay double. If the driver
    regenerates fixtures with a new writer, exactly this test names
    the drift."""
    df = tables.load_table(spark, SF_DIR, table)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == EXPECTED_SCHEMAS[table], (
        f"fixture drift in {table}: loaded schema changed"
    )
