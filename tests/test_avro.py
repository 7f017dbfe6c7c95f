"""Avro container codec + IO tests.

The codec implements the public Avro 1.11 container spec (see
``io/avro_codec.py``); these tests cover binary-encoding edges, both
codecs, the Spark schema bridge, distributed read/write, and the
Avro-backed KV stores that the reference ships
(``kvstore/lib/AvroRecordKeyValueStore.java:84``).
"""

from __future__ import annotations

import datetime
import json

import pytest

from kiji_mapreduce_spark.io import avro_codec as ac
from kiji_mapreduce_spark.io.avro_io import read_avro, write_avro
from kiji_mapreduce_spark.io.inputs import JobInput
from kiji_mapreduce_spark.io.outputs import JobOutput

NESTED_SCHEMA = {
    "type": "record", "name": "doc", "fields": [
        {"name": "k", "type": "string"},
        {"name": "v", "type": ["null", "long"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "int"}},
        {"name": "nest", "type": {"type": "record", "name": "inner",
                                  "fields": [{"name": "a", "type": "int"}]}},
    ]}

NESTED_ROWS = [
    {"k": "x", "v": 5, "tags": ["a", "b"], "props": {"n": 1},
     "nest": {"a": -3}},
    {"k": "y", "v": None, "tags": [], "props": {}, "nest": {"a": 0}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_container_roundtrip(codec):
    buf = ac.write_container(NESTED_SCHEMA, NESTED_ROWS, codec=codec)
    schema, back = ac.read_container(buf)
    assert back == NESTED_ROWS
    assert schema["name"] == "doc"


def test_codec_zigzag_edges():
    schema = {"type": "record", "name": "z",
              "fields": [{"name": "x", "type": "long"}]}
    vals = [{"x": v} for v in
            (0, -1, 1, 63, -64, 64, -65, 2**31, -2**31, 2**62, -2**62)]
    _, back = ac.read_container(ac.write_container(schema, vals, codec="null"))
    assert back == vals


def test_codec_multiple_blocks_and_header_peek():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "i", "type": "int"}]}
    vals = [{"i": i} for i in range(1000)]
    buf = ac.write_container(schema, vals, block_records=64)
    got_schema, back = ac.read_container(buf)
    assert back == vals
    # header-only parse works on a prefix that covers the metadata map
    assert ac.read_container_schema(buf[:2048]) == got_schema


def test_codec_logical_types():
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ]}
    rows = [{"d": datetime.date(2024, 2, 29),
             "ts": datetime.datetime(2024, 2, 29, 12, 0, 0, 123456)},
            {"d": datetime.date(1969, 7, 20),
             "ts": datetime.datetime(1969, 7, 20, 20, 17)}]
    _, back = ac.read_container(ac.write_container(schema, rows))
    assert back == rows


def test_codec_rejects_general_union():
    with pytest.raises(ValueError, match="union"):
        ac.avro_to_spark_type(["int", "string"])


def test_codec_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        ac.read_container(b"nope" + b"\x00" * 32)


def test_spark_schema_bridge_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0], {"k": 2}, (5, "z"))],
        "id long, name string, emb array<double>, m map<string,int>, "
        "s struct<a:int, b:string>")
    avro = ac.spark_schema_to_avro(df.schema)
    st, _ = ac.avro_to_spark_type(avro)
    assert [f.dataType.simpleString() for f in st.fields] == \
        [f.dataType.simpleString() for f in df.schema.fields]


def test_avro_write_read_nested(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["x", "y"], (3, "u")), (2, [], (0, None))],
        "id long, tags array<string>, nest struct<a:int, b:string>")
    write_avro(df, str(tmp_path / "out"))
    back = read_avro(spark, [str(tmp_path / "out")])
    rows = {r.id: r for r in back.collect()}
    assert rows[1].tags == ["x", "y"] and rows[1].nest.a == 3
    assert rows[2].nest.b is None
    assert dict(back.dtypes)["nest"] == "struct<a:int,b:string>"


def test_avro_empty_dataframe_preserves_schema(spark, tmp_path):
    df = spark.createDataFrame([], "k string, v int")
    write_avro(df, str(tmp_path / "empty"))
    back = read_avro(spark, [str(tmp_path / "empty")])
    assert back.count() == 0
    assert dict(back.dtypes) == {"k": "string", "v": "int"}


def test_avro_append_mode(spark, tmp_path):
    df1 = spark.createDataFrame([("a", 1)], "k string, v int")
    df2 = spark.createDataFrame([("b", 2)], "k string, v int")
    write_avro(df1, str(tmp_path / "app"))
    write_avro(df2, str(tmp_path / "app"), mode="append")
    back = read_avro(spark, [str(tmp_path / "app")])
    assert sorted((r.k, r.v) for r in back.collect()) == [("a", 1), ("b", 2)]


def test_avro_job_spec_roundtrip(spark, tmp_path):
    """CLI spec strings route avro through the fallback transparently."""
    from kiji_mapreduce_spark.io.inputs import job_input
    from kiji_mapreduce_spark.io.outputs import job_output

    df = spark.createDataFrame([(i, f"n{i}") for i in range(10)],
                               "id long, name string")
    job_output(f"format=avro@2 file={tmp_path}/spec").save(df)
    back = job_input(f"format=avro file={tmp_path}/spec").load(spark)
    assert back.count() == 10
    import os

    parts = [f for f in os.listdir(tmp_path / "spec") if f.endswith(".avro")]
    assert len(parts) == 2  # @2 nsplits honored


def test_avro_kv_store_first_record_wins(spark, tmp_path):
    """File-backed AvroRecordKeyValueStore now reads real container
    files; duplicate keys resolve to the first record in file order
    (AvroRecordKeyValueStore.java:307)."""
    from kiji_mapreduce_spark.kvstore.stores import AvroRecordKeyValueStore

    schema = {"type": "record", "name": "kv", "fields": [
        {"name": "key", "type": "string"},
        {"name": "val", "type": "int"}]}
    rows = [{"key": "a", "val": 1}, {"key": "b", "val": 2},
            {"key": "a", "val": 99}]
    p = tmp_path / "store"
    p.mkdir()
    (p / "part-00000.avro").write_bytes(ac.write_container(schema, rows))
    store = AvroRecordKeyValueStore(paths=[str(p)], key_field="key")
    got = {r.key: r.val for r in store.dataframe(spark).collect()}
    assert got == {"a": 1, "b": 2}


def test_avro_non_record_top_level(spark, tmp_path):
    """Avro key files (top-level primitive schema) surface as a `value`
    column, like spark-avro."""
    p = tmp_path / "keys"
    p.mkdir()
    (p / "part-00000.avro").write_bytes(
        ac.write_container(json.dumps("long"), [1, 2, 3]))
    back = read_avro(spark, [str(p)])
    assert sorted(r.value for r in back.collect()) == [1, 2, 3]
    assert back.dtypes == [("value", "bigint")]


def test_reader_schema_resolution(spark, tmp_path):
    """avroSchema option (the reference's avro.reader.schema override):
    decode with the writer schema, project onto the reader — dropped
    writer fields vanish, new reader fields take their defaults, a
    default-less new field errors."""
    df = spark.createDataFrame(
        [("a", 1, 9.5), ("b", 2, -1.0)], "k string, v int, x double")
    write_avro(df, str(tmp_path / "evolve"))
    reader = json.dumps({
        "type": "record", "name": "topLevelRecord", "fields": [
            {"name": "k", "type": "string"},
            {"name": "v", "type": ["null", "int"]},
            {"name": "extra", "type": "long", "default": 7},
        ]})
    back = read_avro(spark, [str(tmp_path / "evolve")],
                     {"avroSchema": reader})
    rows = {r.k: r for r in back.collect()}
    assert back.columns == ["k", "v", "extra"]          # x dropped
    assert rows["a"].extra == 7 and rows["b"].v == 2    # default filled
    bad = json.dumps({
        "type": "record", "name": "topLevelRecord", "fields": [
            {"name": "nope", "type": "long"}]})
    with pytest.raises(Exception, match="default"):
        read_avro(spark, [str(tmp_path / "evolve")],
                  {"avroSchema": bad}).collect()


def test_kvstore_avro_file_join_query(spark, sf_dir):
    """The driver-registered end-to-end Avro KV store query returns the
    plain-join result."""
    from kiji_mapreduce_spark import suite

    out = suite.QUERIES["kvstore_avro_file_join"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.nation_name is not None for r in rows)


def test_avro_write_modes_and_codec_errors(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    write_avro(df, str(tmp_path / "m"))
    with pytest.raises(FileExistsError):
        write_avro(df, str(tmp_path / "m"), mode="error")
    write_avro(df, str(tmp_path / "m"), mode="ignore")  # no-op, no raise
    with pytest.raises(ValueError, match="null/deflate"):
        write_avro(df, str(tmp_path / "m2"),
                   options={"compression": "snappy"})
    # uncompressed alias maps to the null codec
    write_avro(df, str(tmp_path / "m3"),
               options={"compression": "uncompressed"})
    assert read_avro(spark, [str(tmp_path / "m3")]).count() == 1


def test_timestamp_exact_far_range_and_ntz_mapping(spark, tmp_path):
    """Far-range timestamps encode with exact integer arithmetic (float
    total_seconds loses microseconds past 2^53), and NTZ round-trips as
    local-timestamp-micros while instants stay timestamp-micros."""
    sentinel = datetime.datetime(9999, 12, 31, 23, 59, 59, 999999)
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}}]}
    _, back = ac.read_container(
        ac.write_container(schema, [{"ts": sentinel}]))
    assert back[0]["ts"] == sentinel
    # spark NTZ column -> local-timestamp-micros -> NTZ on read
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ'2024-06-01 12:00:00' AS wall")
    avro = ac.spark_schema_to_avro(df.schema)
    assert avro["fields"][0]["type"]["logicalType"] == \
        "local-timestamp-micros"
    write_avro(df, str(tmp_path / "ntz"))
    back_df = read_avro(spark, [str(tmp_path / "ntz")])
    assert dict(back_df.dtypes)["wall"] == "timestamp_ntz"
    assert str(back_df.first().wall) == "2024-06-01 12:00:00"


def test_decimal_logical_type_rejected():
    schema = {"type": "record", "name": "d", "fields": [
        {"name": "m", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 2}}]}
    with pytest.raises(ValueError, match="decimal"):
        ac.avro_to_spark_type(schema)
    with pytest.raises(ValueError, match="decimal"):
        ac.write_container(schema, [{"m": b"\x01"}])


def test_union_null_record_top_level(spark, tmp_path):
    """union[null, record] top level: null values surface as all-null
    rows instead of crashing the decode."""
    schema = ["null", {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"}]}]
    p = tmp_path / "nullable"
    p.mkdir()
    (p / "part-00000.avro").write_bytes(
        ac.write_container(schema, [{"a": 5}, None]))
    back = read_avro(spark, [str(p)])
    assert sorted(r.a for r in back.collect()
                  if r.a is not None) == [5]
    assert back.count() == 2


def test_reader_schema_type_mismatch_rejected(spark, tmp_path):
    """Name-only matching is not enough: a reader field redeclaring a
    type the writer's values can't resolve to fails at plan time, not
    executor-side; spec promotions (int->long) are accepted."""
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    write_avro(df, str(tmp_path / "types"))
    bad = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "string"}]})
    with pytest.raises(Exception, match="resolve"):
        read_avro(spark, [str(tmp_path / "types")], {"avroSchema": bad})
    promoted = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"}]})
    back = read_avro(spark, [str(tmp_path / "types")],
                     {"avroSchema": promoted})
    assert back.dtypes == [("v", "bigint")]
    assert back.first().v == 1


def test_kv_store_first_wins_across_files_path_order(spark, tmp_path):
    """First-record-wins must follow file PATH order, not binaryFile's
    size-descending listing: the earlier-named file wins even when it is
    much smaller than a later file carrying the same key."""
    from kiji_mapreduce_spark.kvstore.stores import AvroRecordKeyValueStore

    schema = {"type": "record", "name": "kv", "fields": [
        {"name": "key", "type": "string"},
        {"name": "val", "type": "int"}]}
    p = tmp_path / "multi"
    p.mkdir()
    # part-00000: tiny, holds the authoritative first record
    (p / "part-00000.avro").write_bytes(
        ac.write_container(schema, [{"key": "a", "val": 1}]))
    # part-00001: much larger (size-ordered listing would put it FIRST)
    filler = [{"key": f"f{i}", "val": i} for i in range(500)]
    (p / "part-00001.avro").write_bytes(
        ac.write_container(schema, [{"key": "a", "val": 99}] + filler,
                           codec="null"))
    store = AvroRecordKeyValueStore(paths=[str(p)], key_field="key")
    got = {r.key: r.val for r in store.dataframe(spark).collect()}
    assert got["a"] == 1  # path order, not size order


def test_avrokv_output_wraps_key_value(spark, tmp_path):
    """JobOutput('avrokv') emits the AvroKeyValueOutputFormat record
    shape: columns renamed (key, value) regardless of source names."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    JobOutput("avrokv", str(tmp_path / "kv")).save(df)
    back = JobInput("avrokv", [str(tmp_path / "kv")]).load(spark)
    assert back.columns == ["key", "value"]
    assert sorted((r.key, r.value) for r in back.collect()) == \
        [(1, "x"), (2, "y")]
    with pytest.raises(ValueError, match="2 columns"):
        JobOutput("avrokv", str(tmp_path / "kv3")).save(
            df.withColumn("extra", df.id))


def test_interop_with_java_avro_library(spark, tmp_path):
    """The codec is spec-compliant, not merely self-consistent: files it
    writes are readable by the REAL Java Avro library (org.apache.avro,
    bundled in Spark's jars) and vice versa, deflate codec included."""
    jvm = spark._jvm
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "string"},
        {"name": "v", "type": ["null", "long"]}]}
    mine = str(tmp_path / "mine.avro")
    with open(mine, "wb") as f:
        f.write(ac.write_container(
            schema, [{"k": "a", "v": 5}, {"k": "b", "v": None}],
            codec="deflate"))
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mine),
        jvm.org.apache.avro.generic.GenericDatumReader())
    got = []
    while reader.hasNext():
        got.append(str(reader.next()))
    assert got == ['{"k": "a", "v": 5}', '{"k": "b", "v": null}']

    # Java writes (int field: py4j boxes python ints as Integer), we read
    schema2 = {"type": "record", "name": "r2", "fields": [
        {"name": "k", "type": "string"}, {"name": "v", "type": "int"}]}
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema2))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter())
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    java_file = str(tmp_path / "java.avro")
    w.create(sch, jvm.java.io.File(java_file))
    for k, v in [("x", 42), ("y", -7)]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("k", k)
        rec.put("v", v)
        w.append(rec)
    w.close()
    with open(java_file, "rb") as f:
        _, back = ac.read_container(f.read())
    assert back == [{"k": "x", "v": 42}, {"k": "y", "v": -7}]


def test_default_to_python_logical_and_binary_types():
    """Reader-field defaults must decode to the same Python types
    read_value produces: JSON ints become date/datetime for logical
    types, ISO-8859-1 strings become bytes for bytes/fixed, and the
    conversion recurses through unions (first branch), records, arrays,
    and maps (r4 advice)."""
    import datetime as dt

    from kiji_mapreduce_spark.io.avro_codec import default_to_python

    assert default_to_python(
        {"type": "int", "logicalType": "date"}, 19723
    ) == dt.date(1970, 1, 1) + dt.timedelta(days=19723)
    ts = default_to_python(
        {"type": "long", "logicalType": "timestamp-micros"}, 1_500_000)
    # naive, like read_value's decode (the session pins UTC semantics)
    assert ts == dt.datetime(1970, 1, 1, 0, 0, 1, 500000)
    assert default_to_python("bytes", "\u00ff") == b"\xff"
    assert default_to_python(
        {"type": "fixed", "name": "f4", "size": 2}, "ab") == b"ab"
    # union default uses the FIRST branch; null stays None
    assert default_to_python(["null", "bytes"], None) is None
    assert default_to_python(["bytes", "null"], "a") == b"a"
    # recursion through containers
    rec = default_to_python(
        {"type": "record", "name": "r", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "s", "type": "string"}]},
        {"d": 1, "s": "x"})
    assert rec == {"d": dt.date(1970, 1, 2), "s": "x"}
    assert default_to_python(
        {"type": "array", "items": "bytes"}, ["a", "b"]) == [b"a", b"b"]
    assert default_to_python(
        {"type": "map", "values": {"type": "int", "logicalType": "date"}},
        {"k": 2}) == {"k": dt.date(1970, 1, 3)}
    # unsupported logical types fail loudly rather than mis-typing
    import pytest as _pytest
    with _pytest.raises(ValueError, match="decimal"):
        default_to_python(
            {"type": "bytes", "logicalType": "decimal", "precision": 4},
            "x")
