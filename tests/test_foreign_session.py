"""Queries must work on a SparkSession the repo did not construct.

The driver harness builds its own plain SparkSession (no
``session.get_spark`` factory confs), which in round 1 broke every
events-touching query: ``spark.sql.legacy.parquet.nanosAsLong`` lived
only in the factory, so a foreign session hit PARQUET_TYPE_ILLEGAL on
the events table (parquet TIMESTAMP(NANOS)). This test reproduces that
environment in a subprocess — a bare ``local[2]`` session, no factory —
and runs one query per fixture table through it.

Kept permanently: this is the one bug class in-repo CI cannot see from
the shared session fixture (getOrCreate would return the already
configured session in-process, so a subprocess is required).
"""

from __future__ import annotations

import os
import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Coverage: sql_nation_revenue calls load_tables -> every fixture
# table including events; the rest pin one direct loader per table
# family (events windows, documents, embeddings, lineitem).
PROBE = r"""
import sys
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .appName("foreign-session-probe")
    .getOrCreate()
)

from kafkatoclickhouse_spark import registry
registry.load_all()

sf_dir = "@SF_DIR@"
names = [
    "sql_nation_revenue",      # load_tables: all 10 tables incl. events
    "stream_window_tumbling",  # events direct
    "dedup_exact",             # documents
    "udf_pandas_vector_norm",  # embeddings
    "q1_pricing_summary",      # lineitem
]
for name in names:
    n = registry.QUERIES[name](spark, sf_dir).count()
    print(f"OK {name} rows={n}")
spark.stop()
print("ALL_OK")
"""


@pytest.mark.slow
def test_queries_run_on_foreign_session():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            PROBE.replace("@REPO@", REPO).replace(
                "@SF_DIR@",
                os.environ.get(
                    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
                ),
            ),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ALL_OK" in proc.stdout, proc.stdout[-2000:]
