"""ClickHouse dialect contract (VERDICT r7 #8).

Pins the INSERT statement shape the reference sink emits —
stringTypes quoting, ClickHouseUtil-escape, null rendering, batch
tuple layout — using the reference's OWN configuration contract
(``test.properties:17-27``: database ``ids_test``, table ``cl_test``,
``clickhouse.stringTypes=String,Date,DateTime``). When the reference
checkout is present, the inlined contract values are cross-checked
against its actual properties file, so drift is caught.
"""

from __future__ import annotations

import os

import pytest

from kafkatoclickhouse_spark.streaming import clickhouse_dialect as D
from kafkatoclickhouse_spark.streaming import sink_catalog as SC

# test.properties:17-27 (inlined so the suite is standalone; the
# cross-check below verifies them against the file when available)
REF_DATABASE = "ids_test"
REF_TABLE = "cl_test"
REF_STRING_TYPES = "String,Date,DateTime"
_REF_PROPS = "/root/reference/test.properties"


def test_contract_values_match_reference_properties():
    if not os.path.isfile(_REF_PROPS):
        pytest.skip("reference checkout not present")
    props = {}
    with open(_REF_PROPS) as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, v = line.split("=", 1)
                props[k.strip()] = v.strip()
    assert props["clickhouse.database"] == REF_DATABASE
    assert props["clickhouse.table"] == REF_TABLE
    assert props["clickhouse.stringTypes"] == REF_STRING_TYPES
    assert props["clickhouse.maxRetries"] == "3"


def test_string_types_quoting_matches_reference():
    st = REF_STRING_TYPES.split(",")
    # quoted: exact (case-insensitive) stringTypes members
    assert D.format_value("abc", "String", st) == "'abc'"
    assert D.format_value("2024-01-02", "Date", st) == "'2024-01-02'"
    assert (
        D.format_value("2024-01-02 03:04:05", "DateTime", st)
        == "'2024-01-02 03:04:05'"
    )
    # raw: numerics splice unquoted
    assert D.format_value("42", "Int64", st) == "42"
    assert D.format_value("1.5", "Float64", st) == "1.5"
    # reference sharp edge (MyWindowFunction.scala:91 matches the
    # lowercased RAW type): parameterized/wrapped types do NOT quote
    assert D.format_value("x", "Nullable(String)", st) == "x"
    assert D.format_value("x", "DateTime64(3)", st) == "x"
    # null/empty render as SQL null (unquoted)
    assert D.format_value(None, "String", st) is None
    assert D.format_value("", "String", st) is None


def test_escape_is_clickhouseutil_twin():
    assert D.escape("o'clock") == "o\\'clock"
    assert D.escape("a\\b") == "a\\\\b"
    assert D.escape("line1\nline2\t`tick`") == "line1\\nline2\\t\\`tick\\`"
    assert D.escape(None) == "\\N"
    assert D.escape("plain") == "plain"


def test_batch_insert_statement_shape():
    st = REF_STRING_TYPES.split(",")
    columns = [
        ("essCode", "String"),
        ("cTime", "DateTime"),
        ("soc", "Float64"),
        ("cnt", "Int64"),
    ]
    rows = [
        {
            "essCode": "E'1",
            "cTime": "2024-01-02 03:04:05",
            "soc": "97.5",
            "cnt": "3",
        },
        {"essCode": "E2", "cTime": "2024-01-02 03:04:06", "soc": ""},
    ]
    sql = D.render_batch_insert(
        REF_DATABASE, REF_TABLE, columns, rows, st
    )
    assert sql == (
        "insert into ids_test.cl_test (essCode,cTime,soc,cnt) values "
        "('E\\'1','2024-01-02 03:04:05',97.5,3),"
        "('E2','2024-01-02 03:04:06',null,null)"
    )
    with pytest.raises(ValueError):
        D.render_batch_insert(REF_DATABASE, REF_TABLE, columns, [], st)


def test_balanced_url_splits_like_reference_datasource():
    urls = D.split_balanced_url(
        "jdbc:clickhouse://test01:8123,test02:8123/ids_test?ssl=false"
    )
    assert urls == [
        "jdbc:clickhouse://test01:8123/ids_test?ssl=false",
        "jdbc:clickhouse://test02:8123/ids_test?ssl=false",
    ]
    # the reference's own single-host URL (test.properties:21)
    assert D.split_balanced_url("jdbc:clickhouse://test01:8123") == [
        "jdbc:clickhouse://test01:8123"
    ]
    with pytest.raises(ValueError):
        D.split_balanced_url("jdbc:derby:memory:x")


def test_dialect_composes_with_catalog_projection():
    """End-to-end dialect path: catalog rows -> ordered columns ->
    rendered batch INSERT, with the normalized typed-frame mapping
    (sink_catalog) and the reference-exact quoting coexisting: the
    catalog's Nullable(String) column IS a Spark string column, yet
    renders unquoted — both behaviors pinned on one catalog."""
    catalog = [("essCode", "String"), ("note", "Nullable(String)")]
    struct = SC.catalog_to_struct(catalog)
    assert [f.dataType.typeName() for f in struct.fields] == [
        "string",
        "string",
    ]
    sql = D.render_batch_insert(
        REF_DATABASE,
        REF_TABLE,
        catalog,
        [{"essCode": "E1", "note": "n"}],
        REF_STRING_TYPES.split(","),
    )
    assert sql == (
        "insert into ids_test.cl_test (essCode,note) values ('E1',n)"
    )
