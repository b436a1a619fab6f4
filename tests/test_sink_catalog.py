"""R6 sink-catalog bootstrap (`MyWindowFunction.scala:71-88`):
catalog → StructType → projection, pinned against a stubbed
``system.columns`` result (no ClickHouse JDBC driver in the
container; the transport is an injectable seam)."""

from __future__ import annotations

from pyspark.sql import types as T

from kafkatoclickhouse_spark.streaming import sink_catalog as sc

# A ClickHouse sink table like the reference's cl_test: mixed
# strings / numerics / nullable wrappers / parameterized types.
STUB_CATALOG = [
    ("essCode", "String"),
    ("cTime", "String"),
    ("dayOfYear", "String"),
    ("power", "Nullable(Float64)"),
    ("soc", "Nullable(Int64)"),
    ("retries", "UInt8"),
    ("ratio", "Decimal(10, 4)"),
    ("updated", "DateTime"),
]


def test_fetch_uses_system_columns_query():
    seen = {}

    def run_query(sql):
        seen["sql"] = sql
        return STUB_CATALOG

    got = sc.fetch_sink_catalog(
        None,
        "jdbc:clickhouse://h:8123/ids_test",
        "ids_test",
        "cl_test",
        run_query=run_query,
    )
    assert got == STUB_CATALOG
    assert "system.columns" in seen["sql"]
    assert "database='ids_test'" in seen["sql"]
    assert "table='cl_test'" in seen["sql"]


def test_catalog_to_struct_types():
    struct = sc.catalog_to_struct(STUB_CATALOG)
    by_name = {f.name: f for f in struct.fields}
    assert [f.name for f in struct.fields] == [c for c, _ in STUB_CATALOG]
    assert isinstance(by_name["essCode"].dataType, T.StringType)
    assert isinstance(by_name["power"].dataType, T.DoubleType)
    assert isinstance(by_name["soc"].dataType, T.LongType)
    assert isinstance(by_name["retries"].dataType, T.IntegerType)
    assert by_name["ratio"].dataType == T.DecimalType(10, 4)
    # DateTime is in the reference's DEFAULT stringTypes
    # (test.properties:26) — config wins, so it lands as string
    assert isinstance(by_name["updated"].dataType, T.StringType)
    assert all(f.nullable for f in struct.fields)
    # natural mapping applies when the config doesn't claim the type
    natural = sc.catalog_to_struct(STUB_CATALOG, string_types=["string"])
    nat = {f.name: f for f in natural.fields}
    assert isinstance(nat["updated"].dataType, T.TimestampType)
    assert isinstance(nat["dayOfYear"].dataType, T.StringType)


def test_string_types_config_wins_over_natural_mapping():
    # the reference quotes whatever clickhouse.stringTypes names —
    # honor that even for a numeric-looking catalog type
    t = sc.spark_type_for("DateTime64(3)", ["string", "datetime64"])
    assert isinstance(t, T.StringType)


def test_unknown_type_degrades_to_string():
    assert isinstance(
        sc.spark_type_for("AggregateFunction(uniq, UInt64)"), T.StringType
    )


def test_project_drop_extra_null_missing_order_and_cast(spark):
    df = spark.createDataFrame(
        [("E1", "2024-01-02 03:04:05", "12.5", 7, "junk")],
        "essCode string, cTime string, power string, soc int, extra string",
    )
    out = sc.project_to_catalog(df, STUB_CATALOG)
    assert out.columns == [c for c, _ in STUB_CATALOG]  # extra dropped
    row = out.collect()[0]
    assert row["essCode"] == "E1"
    assert row["power"] == 12.5  # cast string -> double
    assert row["soc"] == 7
    assert row["dayOfYear"] is None  # catalog col missing from frame
    assert row["retries"] is None
    assert out.schema["power"].dataType == T.DoubleType()
    assert out.schema["soc"].dataType == T.LongType()


def test_ingest_pipeline_projects_to_stubbed_catalog(spark, sf_dir):
    """End-to-end R2→R6: the reference-shaped ingest output shaped by
    a bootstrapped catalog instead of the hardcoded column list."""
    from kafkatoclickhouse_spark.operators import ingest
    from kafkatoclickhouse_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    piped = ingest.ingest_pipeline(events)
    out = sc.project_to_catalog(piped, STUB_CATALOG)
    assert out.columns == [c for c, _ in STUB_CATALOG]
    n = out.count()
    assert n == piped.count() and n > 0
    first = out.limit(1).collect()[0]
    assert first["dayOfYear"] == first["cTime"][:10]


def test_job_with_catalog_lands_catalog_shape(
    spark, sf_dir, raw_feed_dir, tmp_path
):
    """job.start(catalog=...) must land parquet whose columns are
    exactly the catalog's, in order, typed — the reference's
    open()-time schema bootstrap applied to the streaming path."""
    from kafkatoclickhouse_spark import config as cfgmod
    from kafkatoclickhouse_spark.streaming import job, sink, source

    cfg = cfgmod.PipelineConfig.from_properties(
        cfgmod.load_properties("configs/example.properties")
    )
    cfg.checkpoint_dir = str(tmp_path / "ckpt")
    catalog = [
        ("essCode", "String"),
        ("cTime", "String"),
        ("dayOfYear", "String"),
        ("power", "Nullable(Float64)"),
        ("soc", "Nullable(Int64)"),
        ("window_id", "Int64"),
        ("not_in_stream", "Nullable(String)"),
    ]
    out_dir = str(tmp_path / "landed")
    q = job.start(
        spark,
        cfg,
        write_fn=sink.parquet_writer(out_dir),
        raw=source.file_raw_stream(spark, raw_feed_dir),
        available_now=True,
        catalog=catalog,
    )
    q.awaitTermination(300)
    landed = spark.read.parquet(out_dir)
    assert landed.columns == [c for c, _ in catalog]
    assert landed.schema["power"].dataType == T.DoubleType()
    assert landed.schema["soc"].dataType == T.LongType()
    rows = landed.limit(5).collect()
    assert rows
    for r in rows:
        assert r["not_in_stream"] is None
        assert r["dayOfYear"] == r["cTime"][:10]


def test_uint64_maps_to_decimal_20_0():
    # LongType tops out at 2^63-1; ClickHouse UInt64 ids/hashes exceed
    # it, so the catalog mapping must widen to Decimal(20,0).
    assert sc.spark_type_for("UInt64") == T.DecimalType(20, 0)
    assert sc.spark_type_for("Nullable(UInt64)") == T.DecimalType(20, 0)


def test_fetch_escapes_quotes_in_identifiers():
    seen = {}

    def run_query(sql):
        seen["sql"] = sql
        return []

    sc.fetch_sink_catalog(
        None,
        "jdbc:clickhouse://h:8123",
        "bad'db",
        "tbl'; drop table x; --",
        run_query=run_query,
    )
    assert "database='bad''db'" in seen["sql"]
    assert "table='tbl''; drop table x; --'" in seen["sql"]
