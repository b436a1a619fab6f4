"""R6: sink-schema bootstrap from the target table's catalog.

The reference discovers the sink schema at operator open() by querying
ClickHouse ``system.columns`` for (name, type) of the configured
table (`MyWindowFunction.scala:71-82`) and then, per record, emits
exactly the catalog's columns — record fields absent from the catalog
are DROPPED, catalog columns absent from the record become NULL, and
the configured ``clickhouse.stringTypes`` decide which values are
quoted as strings (`MyWindowFunction.scala:43-48,85-95`).

Spark-first equivalent: the catalog read is a driver-side JDBC query
(one tiny result set, fetched once per job, broadcast implicitly via
the plan — never per-task), the (name, type) pairs become a
``StructType``, and the projection/typing is a plain ``select`` with
casts that Catalyst folds into the sink stage. The quoting machinery
disappears: typed columns + parameterized JDBC batches make it moot.

No ClickHouse JDBC driver ships in this container, so
``fetch_sink_catalog`` is exercised through its injectable
``run_query`` seam (tests stub the catalog rows); the type mapping
and projection semantics are pinned by pytest either way.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# default of clickhouse.stringTypes (test.properties:26), lowercased
# like the reference does (MyWindowFunction.scala:25)
DEFAULT_STRING_TYPES = ("string", "date", "datetime")

_NULLABLE = re.compile(r"^nullable\((.+)\)$")
_PARAMS = re.compile(r"\(.*\)$")


def _base_type(ch_type: str) -> str:
    """Normalize a ClickHouse type name: lowercase, unwrap
    Nullable(...), strip type parameters (FixedString(16) →
    fixedstring, DateTime64(3) → datetime64)."""
    t = ch_type.strip().lower()
    m = _NULLABLE.match(t)
    if m:
        t = m.group(1).strip()
    return _PARAMS.sub("", t)


def spark_type_for(
    ch_type: str, string_types: Sequence[str] = DEFAULT_STRING_TYPES
) -> T.DataType:
    """Map a ClickHouse catalog type to the Spark type the sink frame
    should carry. The reference only distinguishes quoted-vs-raw
    (stringTypes membership); we additionally give integers/floats
    their natural Spark types so downstream arithmetic stays typed.
    Unknown types degrade to string — the reference's passthrough
    behavior, never a crash."""
    base = _base_type(ch_type)
    if base in {s.strip().lower() for s in string_types}:
        return T.StringType()
    if base in ("float32",):
        return T.FloatType()
    if base in ("float64",):
        return T.DoubleType()
    if re.fullmatch(r"u?int(8|16|32)", base):
        return T.IntegerType() if base != "uint32" else T.LongType()
    if base == "int64":
        return T.LongType()
    if base == "uint64":
        # LongType tops out at 2^63-1; ClickHouse UInt64 ids/hashes
        # routinely exceed it. Decimal(20,0) holds the full range.
        return T.DecimalType(20, 0)
    if base.startswith("decimal"):
        m = re.search(r"\((\d+)\s*,\s*(\d+)\)", ch_type)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(38, 18)
    if base == "bool":
        return T.BooleanType()
    if base in ("date", "date32"):
        return T.DateType()
    if base in ("datetime", "datetime64"):
        return T.TimestampType()
    return T.StringType()


def catalog_to_struct(
    columns: Sequence[tuple[str, str]],
    string_types: Sequence[str] = DEFAULT_STRING_TYPES,
) -> T.StructType:
    """(name, clickhouse_type) pairs — catalog order — to a nullable
    StructType (every sink column is nullable: missing record fields
    become NULL, `MyWindowFunction.scala:85-88`)."""
    return T.StructType(
        [
            T.StructField(name, spark_type_for(ch, string_types), True)
            for name, ch in columns
        ]
    )


def fetch_sink_catalog(
    spark: SparkSession,
    jdbc_url: str,
    database: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    run_query: Callable[[str], list[tuple[str, str]]] | None = None,
) -> list[tuple[str, str]]:
    """The reference's ``getCoumnName`` (`MyWindowFunction.scala:71-82`):
    read (name, type) for the sink table from ``system.columns``.

    Driver-side, once per job — the result is a handful of rows that
    parameterize the plan; shipping it to executors costs nothing.
    ``run_query`` injects the transport: tests pass a stub; production
    omits it and the query runs through ``spark.read.jdbc`` (requires
    the ClickHouse JDBC driver on the classpath, absent in this
    container)."""
    # single-quote-escape the identifiers: they arrive from config /
    # URL parsing, and a stray quote must not break (or inject into)
    # the catalog query. ClickHouse escapes ' as '' inside literals.
    db_lit = database.replace("\\", "\\\\").replace("'", "''")
    tbl_lit = table.replace("\\", "\\\\").replace("'", "''")
    sql = (
        "select name, `type` from system.columns "
        f"where database='{db_lit}' and table='{tbl_lit}'"
    )
    if run_query is not None:
        return list(run_query(sql))
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("query", sql)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    return [(r["name"], r["type"]) for r in reader.load().collect()]


def project_to_catalog(
    df: DataFrame,
    columns: Sequence[tuple[str, str]],
    string_types: Sequence[str] = DEFAULT_STRING_TYPES,
) -> DataFrame:
    """Shape a frame to the sink catalog: keep catalog columns in
    catalog order (extras DROPPED), NULL for catalog columns the
    frame lacks, cast each to the catalog's type. This is the typed
    twin of the reference's per-record loop over the catalog map
    (`MyWindowFunction.scala:43-48`) — here it is one select Catalyst
    collapses into the sink projection."""
    struct = catalog_to_struct(columns, string_types)
    out = []
    for field in struct.fields:
        if field.name in df.columns:
            out.append(F.col(field.name).cast(field.dataType))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*out)
