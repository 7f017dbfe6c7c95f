"""KeyValueStore subsystem (SURVEY.md §2.4; reference kvstore/lib tests)."""

import pytest
from pyspark.sql import functions as F

from kiji_mapreduce_spark.kvstore import (
    DataFrameKeyValueStore, EmptyKeyValueStore, InMemoryMapKeyValueStore,
    TableKeyValueStore, TextFileKeyValueStore, UnconfiguredKeyValueStore,
    bind_stores, parse_bindings_xml,
)


def test_in_memory_store_lookup(spark):
    probe = spark.createDataFrame([("a",), ("b",), ("zz",)], "key string")
    store = InMemoryMapKeyValueStore(data={"a": "1", "b": "2"})
    got = {r.key: r.value for r in store.lookup(probe).collect()}
    assert got == {"a": "1", "b": "2", "zz": None}  # miss -> null (get())
    assert store.lookup(probe, how="left_semi").count() == 2
    assert store.lookup(probe, how="left_anti").count() == 1


def test_text_file_store(spark, tmp_path):
    p = tmp_path / "kv.tsv"
    p.write_text("a\t1\nb\t2:2\nskipme\n")
    store = TextFileKeyValueStore(paths=[str(p)])
    got = {r.key: r.value for r in store.dataframe(spark).collect()}
    assert got == {"a": "1", "b": "2:2"}  # delimiter-less line skipped


def test_text_file_store_custom_delimiter(spark, tmp_path):
    p = tmp_path / "kv.csv"
    p.write_text("x,10\ny,20\n")
    store = TextFileKeyValueStore(paths=[str(p)], delimiter=",")
    assert store.reader(spark)["y"].value == "20"


def test_table_store_latest_in_range(spark):
    table = spark.createDataFrame(
        [(("u1",), ([(30, "new"), (20, "mid"), (10, "old")],))],
        "entity_id struct<key:string>, "
        "info struct<name:array<struct<ts:long,value:string>>>")
    store = TableKeyValueStore(table=table, column="info:name",
                               min_ts=5, max_ts=25)
    got = store.dataframe(spark).first()
    assert got.value == "mid"  # newest within [5, 25)


def test_empty_and_unconfigured(spark):
    assert EmptyKeyValueStore().reader(spark) == {}
    with pytest.raises(RuntimeError):
        UnconfiguredKeyValueStore().dataframe(spark)


def test_bind_stores_validation():
    req = {"a": None, "b": InMemoryMapKeyValueStore(data={})}
    with pytest.raises(ValueError, match="'a' is not bound"):
        bind_stores(req, {})
    with pytest.raises(ValueError, match="undeclared"):
        bind_stores(req, {"zzz": EmptyKeyValueStore()})
    out = bind_stores(req, {"a": EmptyKeyValueStore()})
    assert isinstance(out["a"], EmptyKeyValueStore)
    assert isinstance(out["b"], InMemoryMapKeyValueStore)


def test_bindings_xml_roundtrip():
    xml = """
    <stores>
      <store class="org.kiji.mapreduce.kvstore.lib.TextFileKeyValueStore" name="t">
        <configuration>
          <property><name>paths</name><value>/a,/b</value></property>
          <property><name>delimiter</name><value>,</value></property>
        </configuration>
      </store>
      <store class="InMemoryMapKeyValueStore" name="m"/>
    </stores>
    """
    stores = parse_bindings_xml(xml)
    assert stores["t"].paths == ["/a", "/b"]
    assert stores["t"].delimiter == ","
    assert isinstance(stores["m"], InMemoryMapKeyValueStore)


def test_bindings_xml_errors():
    with pytest.raises(ValueError, match="root"):
        parse_bindings_xml("<x/>")
    with pytest.raises(ValueError, match="unknown store class"):
        parse_bindings_xml('<stores><store class="Nope" name="n"/></stores>')
    with pytest.raises(ValueError, match="name"):
        parse_bindings_xml('<stores><store class="EmptyKeyValueStore"/></stores>')


def test_dataframe_store_first_wins(spark):
    df = spark.createDataFrame([("k", 1), ("k", 2)], "key string, v int")
    store = DataFrameKeyValueStore(df=df, key_cols=["key"])
    assert store.dataframe(spark).count() == 1  # dup keys collapse


def test_avro_record_store_first_record_wins(spark, tmp_path):
    """First-in-file-order record wins per key (reference
    AvroRecordKeyValueStore semantics), using the parquet fallback."""
    from kiji_mapreduce_spark.kvstore import AvroRecordKeyValueStore

    p = str(tmp_path / "recs")
    spark.createDataFrame(
        [(1, "first"), (2, "only"), (1, "second")], "key int, name string"
    ).coalesce(1).write.parquet(p)
    store = AvroRecordKeyValueStore(paths=[p], key_field="key",
                                    format="parquet")
    got = {r.key: r.name for r in store.dataframe(spark).collect()}
    assert got == {1: "first", 2: "only"}


def test_reader_size_cap(spark):
    """reader() refuses to collect oversized stores (the reference's
    stores are explicitly small-side; big stores must go through
    lookup()'s broadcast join)."""
    import pytest

    from kiji_mapreduce_spark.kvstore.stores import DataFrameKeyValueStore

    store = DataFrameKeyValueStore(
        df=spark.range(50).withColumnRenamed("id", "key"),
        key_cols=["key"])
    with pytest.raises(ValueError, match="lookup"):
        store.reader(spark, max_rows=10)
    assert len(store.reader(spark, max_rows=50)) == 50


def test_lookup_partial_composite_key_rejected(spark):
    """A probe column list shorter than the store's composite key must
    raise — zip used to silently join on a partial key (r5 review)."""
    import pytest

    from kiji_mapreduce_spark.kvstore import DataFrameKeyValueStore

    build = spark.createDataFrame([("a", "b", 1)],
                                  "k1 string, k2 string, v long")
    store = DataFrameKeyValueStore(df=build, key_cols=["k1", "k2"])
    probe = spark.createDataFrame([("a",)], "k1 string")
    with pytest.raises(ValueError, match="composite key"):
        store.lookup(probe, on=["k1"])


def test_bindings_cache_size_accepted_and_ignored(spark, tmp_path):
    """The reference's cache_size LRU knob parses without crashing the
    store construction (broadcast joins replace the per-task LRU)."""
    from kiji_mapreduce_spark.kvstore.bindings import parse_bindings_xml

    (tmp_path / "kv.txt").write_text("a\t1\n")
    xml = f"""
    <stores>
      <store name="s" class="org.kiji.TextFileKeyValueStore">
        <configuration>
          <property><name>paths</name><value>{tmp_path}/kv.txt</value></property>
          <property><name>cache_size</name><value>100</value></property>
        </configuration>
      </store>
    </stores>"""
    stores = parse_bindings_xml(xml)
    got = stores["s"].reader(spark)
    assert list(got) == ["a"] and "1" in str(got["a"])


def test_inmemory_map_store_empty_and_reader_signature(spark):
    """An EMPTY literal-map binding behaves like EmptyKeyValueStore
    instead of crashing schema inference, and reader() accepts the base
    class's max_rows argument (r13 review findings)."""
    from kiji_mapreduce_spark.kvstore.stores import (
        EmptyKeyValueStore, InMemoryMapKeyValueStore)

    store = InMemoryMapKeyValueStore(data={})
    assert store.dataframe(spark).count() == 0
    assert store.reader(spark, max_rows=10) == {}
    assert EmptyKeyValueStore().reader(spark, max_rows=10) == {}
    # lookup through the empty store: every probe misses, none crash
    df = spark.createDataFrame([("k1",)], "key string")
    out = store.lookup(df)
    assert out.count() == 1
    assert out.collect()[0].value is None


def test_bindings_reject_table_store_and_nameless_property():
    """Table-backed stores cannot be built from XML string properties
    (they crashed far from the parse), and a <property> without <name>
    errors at parse time instead of an opaque TypeError."""
    import pytest

    from kiji_mapreduce_spark.kvstore.bindings import parse_bindings_xml

    with pytest.raises(ValueError, match="bindings XML"):
        parse_bindings_xml(
            '<stores><store class="KijiTableKeyValueStore" name="s">'
            "<configuration><property><name>table</name>"
            "<value>users</value></property></configuration>"
            "</store></stores>")
    with pytest.raises(ValueError, match="missing <name>"):
        parse_bindings_xml(
            '<stores><store class="TextFileKeyValueStore" name="t">'
            "<configuration><property><value>/a</value></property>"
            "</configuration></store></stores>")
