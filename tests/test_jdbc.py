"""Live JDBC sink integration — closes VERDICT r6 brief #5.

No ClickHouse driver ships in the container, but Apache Derby's
embedded JDBC driver is on Spark's own classpath (pyspark/jars), so
the R7 sink path (`ClickHouseSink.scala:18-68`) is exercised here
against a REAL database over a REAL JDBC connection end-to-end:
table creation, retry on an injected transient failure, and the
effectively-once ledger suppressing a replayed micro-batch. The one
ClickHouse-specific piece — the literal ``system.columns`` catalog
SQL (`MyWindowFunction.scala:71-82`) — cannot parse on Derby and
stays contract-pinned by the stub-transport tests in
test_sink_catalog.py; the catalog→StructType→projection→JDBC-append
chain itself is driven live below with the catalog rows read from
Derby's SYS tables over JDBC.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafkatoclickhouse_spark.streaming.sink import (
    foreach_batch_writer,
    idempotent_foreach_batch_writer,
    jdbc_writer,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRIVER)
        .option("dbtable", table)
        .load()
    )


@pytest.fixture()
def sample(spark):
    return spark.range(100).select(
        F.col("id").alias("essCode"),
        (F.col("id") * 2).alias("val"),
    )


def test_jdbc_writer_roundtrip_live(spark, tmp_path, sample):
    """jdbc_writer appends through a live embedded-Derby connection;
    Spark creates the table on first append and a JDBC read returns
    the exact rows."""
    url = _url(tmp_path, "db1")
    jdbc_writer(url, "events_sink")(sample)
    got = _read(spark, url, "events_sink")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, sample.collect())
    )


def test_jdbc_retry_recovers_live(spark, tmp_path, sample):
    """An injected transient failure on the first attempt must be
    retried and the batch must land exactly once (the reference
    DROPS the batch after retries — we re-raise and here converge
    within the retry budget)."""
    url = _url(tmp_path, "db2")
    real = jdbc_writer(url, "retry_sink")
    calls = {"n": 0}

    def flaky(df):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected transient sink failure")
        real(df)

    writer = foreach_batch_writer(flaky, max_retries=3, backoff_s=0)
    writer(sample, 0)
    assert calls["n"] == 2
    assert _read(spark, url, "retry_sink").count() == sample.count()


def test_jdbc_exhausted_retries_reraise_live(spark, tmp_path, sample):
    """After the retry budget the failure must surface (so Spark
    replays the micro-batch) — never the reference's silent drop."""

    def always_fail(df):
        raise RuntimeError("sink down")

    writer = foreach_batch_writer(always_fail, max_retries=2, backoff_s=0)
    with pytest.raises(RuntimeError, match="sink down"):
        writer(sample, 0)


def test_idempotent_ledger_suppresses_replay_live(
    spark, tmp_path, sample
):
    """Checkpoint-replay of a committed batch_id must not write
    twice: the ledger marker written after the FIRST successful JDBC
    append short-circuits the second delivery."""
    url = _url(tmp_path, "db3")
    writer = idempotent_foreach_batch_writer(
        jdbc_writer(url, "once_sink"), str(tmp_path / "ledger")
    )
    writer(sample, 7)
    writer(sample, 7)  # replayed batch
    assert _read(spark, url, "once_sink").count() == sample.count()
    writer(sample, 8)  # a NEW batch still lands
    assert _read(spark, url, "once_sink").count() == 2 * sample.count()


def test_catalog_bootstrap_projection_append_live(spark, tmp_path):
    """The R6 chain live: read the sink table's column catalog over
    JDBC (Derby SYS tables standing in for ClickHouse
    system.columns), build the StructType, project a frame with
    extra + missing fields onto it, and append through the JDBC
    sink; the landed rows carry exactly the catalog's shape."""
    from kafkatoclickhouse_spark.streaming.sink_catalog import (
        catalog_to_struct,
        project_to_catalog,
    )

    url = _url(tmp_path, "db4")
    seed = spark.createDataFrame(
        [("s1", 1, 1.5)], "essCode string, soc int, power double"
    )
    jdbc_writer(url, "cat_sink")(seed)

    # live driver-side catalog read — the reference's getCoumnName
    # against the engine's own catalog tables (one tiny result set)
    cols_df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRIVER)
        .option(
            "dbtable",
            "(SELECT c.COLUMNNAME AS name, "
            "CAST(c.COLUMNDATATYPE AS VARCHAR(64)) AS dtype, "
            "c.COLUMNNUMBER AS pos "
            "FROM SYS.SYSCOLUMNS c JOIN SYS.SYSTABLES t "
            "ON c.REFERENCEID = t.TABLEID "
            "WHERE t.TABLENAME = 'CAT_SINK') cat",  # Derby uppercases
            # unquoted table identifiers; column names are preserved
        )
        .load()
    )
    derby_to_ch = {"VARCHAR": "String", "CLOB": "String",
                   "INTEGER": "Int32", "DOUBLE": "Float64"}
    catalog = [
        (r["NAME"], derby_to_ch[r["DTYPE"].split("(")[0].strip()])
        for r in sorted(cols_df.collect(), key=lambda r: r["POS"])
    ]
    assert [c for c, _ in catalog] == ["essCode", "soc", "power"]

    struct = catalog_to_struct(catalog)
    assert [f.name for f in struct.fields] == ["essCode", "soc", "power"]

    incoming = spark.createDataFrame(
        [("s2", "2", "extra-dropped")],
        "essCode string, soc string, junk string",  # junk: not in catalog
    )
    shaped = project_to_catalog(incoming, catalog)
    assert shaped.columns == ["essCode", "soc", "power"]
    jdbc_writer(url, "cat_sink")(shaped)

    got = {
        r["essCode"]: (r["soc"], r["power"])
        for r in _read(spark, url, "cat_sink").collect()
    }
    assert got["s1"] == (1, 1.5)
    assert got["s2"] == (2, None)  # cast applied, missing col NULL
