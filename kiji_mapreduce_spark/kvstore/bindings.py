"""XML store-binding files.

The reference lets jobs bind stores from an XML file
(``withStoreBindingsFile``; parser ``.../kvstore/impl/XmlKeyValueStoreParser.java``;
format example ``kiji-mapreduce/src/test/resources/org/kiji/mapreduce/test-kvstores.xml``)::

    <stores>
      <store class="TextFileKeyValueStore" name="mystore">
        <configuration>
          <property><name>paths</name><value>/data/x.tsv</value></property>
          <property><name>delimiter</name><value>,</value></property>
        </configuration>
      </store>
    </stores>

We parse the same shape into our store classes (class names accepted with
or without the reference's ``org.kiji...lib.`` prefix).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from kiji_mapreduce_spark.kvstore import stores as _stores

_CLASSES = {
    "InMemoryMapKeyValueStore": _stores.InMemoryMapKeyValueStore,
    "TextFileKeyValueStore": _stores.TextFileKeyValueStore,
    "AvroRecordKeyValueStore": _stores.AvroRecordKeyValueStore,
    "AvroKVRecordKeyValueStore": _stores.AvroKVRecordKeyValueStore,
    "SeqFileKeyValueStore": _stores.SeqFileKeyValueStore,
    "KijiTableKeyValueStore": _stores.TableKeyValueStore,
    "TableKeyValueStore": _stores.TableKeyValueStore,
    "EmptyKeyValueStore": _stores.EmptyKeyValueStore,
    "UnconfiguredKeyValueStore": _stores.UnconfiguredKeyValueStore,
}

_LIST_PROPS = {"paths"}
_INT_PROPS = {"min_ts", "max_ts", "cache_size"}


def parse_bindings_xml(text: str) -> dict[str, _stores.KeyValueStore]:
    """Parse a bindings XML document into {name: store}."""
    root = ET.fromstring(text)
    if root.tag != "stores":
        raise ValueError(f"expected <stores> root, got <{root.tag}>")
    out: dict[str, _stores.KeyValueStore] = {}
    for store_el in root.findall("store"):
        cls_name = store_el.get("class", "").rsplit(".", 1)[-1]
        name = store_el.get("name")
        if not name:
            raise ValueError("<store> requires a name attribute")
        if cls_name not in _CLASSES:
            raise ValueError(f"unknown store class {cls_name!r}")
        if _CLASSES[cls_name] is _stores.TableKeyValueStore:
            # a table-backed store needs a live DataFrame and a
            # key-column LIST — neither is expressible as XML string
            # properties, and binding them anyway crashed far from the
            # parse (a str 'table' has no .select; a str 'key_cols'
            # unpacks per CHARACTER — r13 review finding). The
            # reference binds table stores by URI, which this engine
            # resolves at job wiring time, not in the bindings file.
            raise ValueError(
                f"store {name!r}: {cls_name} cannot be configured from "
                "bindings XML — construct TableKeyValueStore in code "
                "and pass it via the job's store map")
        kwargs = {}
        conf = store_el.find("configuration")
        if conf is not None:
            for prop in conf.findall("property"):
                pname = prop.findtext("name")
                if pname is None:
                    raise ValueError(
                        f"store {name!r}: <property> missing <name>")
                pval = prop.findtext("value") or ""
                if pname in _LIST_PROPS:
                    kwargs[pname] = [p for p in pval.split(",") if p]
                elif pname in _INT_PROPS:
                    kwargs[pname] = int(pval)
                else:
                    kwargs[pname] = pval
        # cache_size is the reference's per-task LRU knob
        # (KijiTableKeyValueStore.java:526-530) — parsed for
        # compatibility but meaningless here (broadcast joins replace
        # the LRU); dropping it beats a TypeError from a constructor
        # that has no such field (r5 review finding)
        kwargs.pop("cache_size", None)
        out[name] = _CLASSES[cls_name](**kwargs)
    return out
