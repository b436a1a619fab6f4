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
