"""Layout -> StructType compilation and DataRequest projection
(FIXTURES.md F1/F2; reference layout/test.json semantics)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StructType

from kiji_mapreduce_spark.layout import TableLayout, RowKeySpec
from kiji_mapreduce_spark.request import ColumnRequest, DataRequest

LAYOUT_JSON = """
{"name": "users",
 "row_key": {"format": "HASH_PREFIX",
             "components": [{"name": "key", "type": "string"}]},
 "families": [
   {"name": "info", "kind": "group", "max_versions": 3,
    "columns": [{"name": "email", "schema": "string"},
                {"name": "zip_code", "schema": "int"}]},
   {"name": "map_family", "kind": "map", "map_schema": "string"}]}
"""


def test_layout_json_roundtrip_and_schema():
    layout = TableLayout.from_json(LAYOUT_JSON)
    schema = layout.spark_schema()
    assert schema.fieldNames() == ["entity_id", "info", "map_family"]
    info = schema["info"].dataType
    assert isinstance(info, StructType)
    assert info["email"].dataType.simpleString() == \
        "array<struct<ts:bigint,value:string>>"
    assert info["zip_code"].dataType.simpleString() == \
        "array<struct<ts:bigint,value:int>>"
    assert isinstance(schema["map_family"].dataType, MapType)
    # round trip
    again = TableLayout.from_json(layout.to_json())
    assert again.spark_schema() == schema


def test_bad_row_key_format():
    with pytest.raises(ValueError):
        RowKeySpec(format="NOPE")


def test_bad_cell_schema():
    with pytest.raises(ValueError, match="unsupported cell schema"):
        TableLayout.from_json(
            '{"name": "x", "families": [{"name": "f", "columns":'
            ' [{"name": "c", "schema": "not_a_type"}]}]}'
        ).spark_schema()


RECORD_LAYOUT_JSON = """
{"name": "profiles",
 "row_key": {"format": "HASH",
             "components": [{"name": "key", "type": "string"}]},
 "families": [
   {"name": "info", "kind": "group",
    "columns": [
      {"name": "contact", "schema":
        {"type": "record", "name": "Contact", "fields": [
          {"name": "email", "type": "string"},
          {"name": "zips", "type": {"type": "array", "items": "int"}},
          {"name": "home", "type": {"type": "record", "name": "Addr",
            "fields": [{"name": "city", "type": "string"},
                       {"name": "opt", "type": ["null", "long"]}]}}]}},
      {"name": "n_logins", "schema": "counter"}]}]}
"""


def test_layout_record_cell_schema_and_roundtrip():
    """The JSON dialect declares nested Avro record/array/union cell
    schemas (reference stores IndexedRecord cells,
    AvroRecordKeyValueStore.java:84); layouts with them round-trip."""
    layout = TableLayout.from_json(RECORD_LAYOUT_JSON)
    contact = layout.spark_schema()["info"].dataType["contact"].dataType
    assert contact.simpleString() == (
        "array<struct<ts:bigint,value:struct<email:string,"
        "zips:array<int>,home:struct<city:string,opt:bigint>>>>")
    again = TableLayout.from_json(layout.to_json())
    assert again.spark_schema() == layout.spark_schema()


def test_layout_spark_ddl_cell_schema():
    """Programmatic Spark types serialize to DDL and parse back."""
    layout = TableLayout.from_json(
        '{"name": "x", "families": [{"name": "f", "columns":'
        ' [{"name": "c", "schema": "struct<a:bigint,b:array<double>>"}]}]}')
    assert layout.spark_schema()["f"].dataType["c"].dataType.simpleString() \
        == "array<struct<ts:bigint,value:struct<a:bigint,b:array<double>>>>"


def test_multi_branch_union_rejected():
    with pytest.raises(ValueError, match="union"):
        TableLayout.from_json(
            '{"name": "x", "families": [{"name": "f", "columns":'
            ' [{"name": "c", "schema": ["int", "string"]}]}]}'
        ).spark_schema()


def _user_df(spark):
    layout = TableLayout.from_json(LAYOUT_JSON)
    rows = [
        (("alice",),
         ([(20, "a2@x.com"), (10, "a1@x.com")], [(10, 94110)]),
         {"t1": [(10, "hello")], "p9": [(10, "bye")]}),
    ]
    return spark.createDataFrame(rows, layout.spark_schema()), layout


def test_data_request_projection_and_versions(spark):
    df, _ = _user_df(spark)
    req = DataRequest.build("info:email", max_versions=1)
    out = req.apply(df)
    assert out.columns == ["entity_id", "info_email"]
    assert [c.value for c in out.first().info_email] == ["a2@x.com"]


def test_data_request_ts_range(spark):
    df, _ = _user_df(spark)
    req = DataRequest([ColumnRequest("info", "email", max_versions=10,
                                     min_ts=5, max_ts=15)])
    out = req.apply(df)
    assert [c.ts for c in out.first().info_email] == [10]


def test_map_family_regex_filter(spark):
    df, _ = _user_df(spark)
    req = DataRequest([ColumnRequest("map_family", qualifier_regex="^t")])
    out = req.apply(df)
    fam = out.first().map_family
    assert set(fam.keys()) == {"t1"}


def test_strip_values(spark):
    df, _ = _user_df(spark)
    req = DataRequest([ColumnRequest("info", "email", strip_values=True,
                                     max_versions=5)])
    cell = req.apply(df).first().info_email[0]
    assert cell.ts == 20 and cell.value is None


def test_reader_schema_override(spark):
    """ColumnReaderSpec analogue: read int-written cells through a long
    reader schema."""
    df, _ = _user_df(spark)
    req = DataRequest([ColumnRequest("info", "zip_code",
                                     reader_schema="long")])
    out = req.apply(df)
    assert dict(out.dtypes)["info_zip_code"] == \
        "array<struct<ts:bigint,value:bigint>>"
    assert out.first().info_zip_code[0].value == 94110


def test_row_key_exprs(spark):
    _, layout = _user_df(spark)
    df, _ = _user_df(spark)
    out = df.select(
        layout.row_key.key_expr().alias("k"),
        layout.row_key.hash_expr().alias("h"))
    row = out.first()
    assert row.k == "alice"
    assert isinstance(row.h, (bytes, bytearray)) and len(row.h) > 2


def test_whole_family_request_slices_versions(spark):
    """KijiDataRequest semantics: max_versions / ts-range apply to
    whole-family requests too, for BOTH group (struct) and map
    families — a bare-family request used to return every version
    unsliced (r5 review finding)."""
    from kiji_mapreduce_spark.request import ColumnRequest, DataRequest

    df = spark.createDataFrame(
        [(("r1",), ([(3, "v3"), (2, "v2"), (1, "v1")],),
          {"q": [(9, "m9"), (8, "m8")]})],
        "entity_id struct<key:string>, "
        "info struct<email: array<struct<ts:long, value:string>>>, "
        "m map<string, array<struct<ts:long, value:string>>>")
    req = DataRequest([
        ColumnRequest(family="info", max_versions=1),
        ColumnRequest(family="m", max_versions=1),
    ])
    row = req.apply(df).first()
    assert [c.ts for c in row.info.email] == [3]
    assert [c.ts for c in row.m["q"]] == [9]
    # ts-range slicing on a whole group family
    req2 = DataRequest([ColumnRequest(family="info", max_versions=10,
                                      min_ts=2, max_ts=3)])
    row2 = req2.apply(df).first()
    assert [c.ts for c in row2.info.email] == [2]


def test_qualifier_regex_on_group_family_raises(spark):
    """qualifier_regex on a group (struct) family is a contract error
    with a clear message, not an opaque map_filter AnalysisException
    (r13 review finding); the reference's RegexQualifierColumnFilter is
    likewise map-family-only."""
    import pytest
    from pyspark.sql import types as T

    from kiji_mapreduce_spark.request import ColumnRequest

    struct_t = T.StructType([T.StructField("name", T.StringType())])
    req = ColumnRequest(family="info", qualifier_regex="^na.*")
    with pytest.raises(ValueError, match="MAP families"):
        req.exprs(family_type=struct_t)
