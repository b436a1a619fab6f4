"""CDC batch-merge as a registered, oracle-checked query.

The reference's sink contract is "INSERT into a ReplacingMergeTree
and let background merges collapse versions" (SURVEY §4.3); the
engine applies that merge eagerly (`sources/files.py:cdc_merge_plan`,
used by ``apply_cdc_batch`` and the streaming ``cdc_merge_writer``).
This module exposes the merge PLAN itself as a query so the driver's
correctness gate and the bench/scale curve cover it like any other
operator (VERDICT r6 #6): a deterministic change feed is derived
from ``orders`` (2% updated rows at version 2, ~1% tombstones at
version 3) and merged against the version-1 base.

The synthesized feed gives every (key, version) pair a unique
version, so the whole-row-hash tiebreak in the plan never decides —
which is what makes the DuckDB oracle exact (xxhash64 is not
replayable in DuckDB; tie DETERMINISM under equal versions is pinned
separately by tests/test_sources.py's interleaving property test).

Scale shape: one key-hash exchange over base ∪ changes, partial
nothing — the same window-collapse every engine's MERGE runs; linear
in table size, and incremental cost is bounded by the change feed
when the base is bucketed on the key (write_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkatoclickhouse_spark.registry import query
from kafkatoclickhouse_spark.sources.files import cdc_merge_plan
from kafkatoclickhouse_spark.tables import load_table

UPDATE_MOD = 50  # every 50th order gets a v2 price correction
DELETE_MOD = 97  # every 97th order is tombstoned at v3

_COLS = "o_orderkey, o_custkey, o_totalprice"

_ORACLE = f"""
WITH base AS (
  SELECT {_COLS}, 1 AS version, FALSE AS is_deleted FROM orders
),
changes AS (
  SELECT o_orderkey, o_custkey,
         ROUND(o_totalprice + 1000.0, 2) AS o_totalprice,
         2 AS version, FALSE AS is_deleted
  FROM orders WHERE o_orderkey % {UPDATE_MOD} = 0
  UNION ALL
  SELECT o_orderkey, NULL, NULL, 3, TRUE
  FROM orders WHERE o_orderkey % {DELETE_MOD} = 0
),
merged AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY o_orderkey ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
)
SELECT {_COLS}, version, is_deleted FROM merged WHERE rn = 1
"""


def _base_and_changes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = orders.withColumn("version", F.lit(1)).withColumn(
        "is_deleted", F.lit(False)
    )
    updates = (
        orders.where(F.col("o_orderkey") % UPDATE_MOD == 0)
        .withColumn(
            "o_totalprice", F.round(F.col("o_totalprice") + 1000.0, 2)
        )
        .withColumn("version", F.lit(2))
        .withColumn("is_deleted", F.lit(False))
    )
    tombstones = (
        orders.where(F.col("o_orderkey") % DELETE_MOD == 0)
        .select(
            "o_orderkey",
            F.lit(None).cast("long").alias("o_custkey"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit(3).alias("version"),
            F.lit(True).alias("is_deleted"),
        )
    )
    return base, updates.unionByName(tombstones)


@query("cdc_apply_batch_merge", oracle=_ORACLE)
def cdc_apply_batch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged table after applying the synthesized change feed to the
    version-1 ``orders`` base: newest version per key, tombstones
    persisted (``read_cdc_table`` filters them — the anti-resurrection
    contract)."""
    base, changes = _base_and_changes(spark, sf_dir)
    return cdc_merge_plan(
        base, changes, ("o_orderkey",), "version", "is_deleted"
    )
