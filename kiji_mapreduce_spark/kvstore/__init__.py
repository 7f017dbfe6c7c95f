from kiji_mapreduce_spark.kvstore.stores import (
    KeyValueStore,
    InMemoryMapKeyValueStore,
    TextFileKeyValueStore,
    AvroRecordKeyValueStore,
    AvroKVRecordKeyValueStore,
    SeqFileKeyValueStore,
    TableKeyValueStore,
    DataFrameKeyValueStore,
    EmptyKeyValueStore,
    UnconfiguredKeyValueStore,
    bind_stores,
)
from kiji_mapreduce_spark.kvstore.bindings import parse_bindings_xml

__all__ = [
    "KeyValueStore", "InMemoryMapKeyValueStore", "TextFileKeyValueStore",
    "AvroRecordKeyValueStore", "AvroKVRecordKeyValueStore",
    "SeqFileKeyValueStore", "TableKeyValueStore", "DataFrameKeyValueStore",
    "EmptyKeyValueStore",
    "UnconfiguredKeyValueStore", "bind_stores", "parse_bindings_xml",
]
