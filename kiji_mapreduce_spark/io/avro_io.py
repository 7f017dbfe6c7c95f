"""Avro container read/write for Spark, jar-or-fallback.

The spark-avro DataSource is an external jar; when it is on the
classpath these helpers use it (it splits within big files on sync
markers — the right choice at 100 TB). When it is absent they fall back
to the pure-Python codec in ``avro_codec.py``:

- **read**: ``binaryFile`` scan (one row per file, never split) ->
  ``mapInPandas`` decode, so decode parallelizes across files. Schema
  comes from one file's header, read on an executor (only the header
  bytes travel to the driver).
- **write**: one container file per partition via
  ``mapPartitionsWithIndex`` — distributed encode, local-filesystem
  destinations (the test/staging shape; cluster deployments ship the
  jar).

Mirrors the reference's first-class Avro formats
(``MapReduceJobInputs.java:112-143``, ``MapReduceJobOutputs.java``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from kiji_mapreduce_spark.io import avro_codec


_JAR_PROBE: dict[int, bool] = {}


def spark_avro_jar_available(spark: SparkSession) -> bool:
    """True when the avro DataSource actually resolves. Class presence is
    not enough — Spark 4 ships some ``org.apache.spark.sql.avro`` classes
    in core jars without registering the source — so probe the real
    resolution path with a schema'd load of a non-existent path: a
    missing *source* and a missing *path* raise distinguishable errors."""
    key = id(spark)
    if key not in _JAR_PROBE:
        try:
            spark.read.format("avro").schema("__probe int").load(
                "/__avro_source_probe_nonexistent__")
            _JAR_PROBE[key] = True
        except Exception as e:
            # legacy template says "Failed to find data source"; the
            # non-legacy error condition is DATA_SOURCE_NOT_FOUND with
            # "Failed to find the data source" — match all three so a
            # Spark upgrade can't flip the probe to a false positive
            msg = str(e)
            _JAR_PROBE[key] = not any(
                marker in msg for marker in (
                    "Failed to find data source",
                    "Failed to find the data source",
                    "DATA_SOURCE_NOT_FOUND"))
    return _JAR_PROBE[key]


def read_avro(spark: SparkSession, paths: list[str],
              options: dict | None = None) -> DataFrame:
    options = options or {}
    if spark_avro_jar_available(spark):
        return (spark.read.format("avro").options(**options).load(paths))
    return _read_avro_fallback(spark, paths,
                               reader_schema=options.get("avroSchema"))


def _read_avro_fallback(spark: SparkSession, paths: list[str],
                        reader_schema: str | None = None) -> DataFrame:
    # binaryFile lists files SIZE-descending (bin-packing order); pin
    # lexicographic path order instead so row order — and with it the
    # KV stores' first-record-wins semantics
    # (AvroRecordKeyValueStore.java:307) — is deterministic and matches
    # file naming, not file sizes
    bin_df = spark.read.format("binaryFile").load(paths).orderBy("path")

    # schema: decode ONE file's header executor-side; only the JSON
    # schema string is collected (never a file's contents)
    def _schema_of(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                yield pd.DataFrame({
                    "s": [json.dumps(
                        avro_codec.read_container_schema(bytes(content)))]})
                return

    head = (bin_df.select("content").limit(1)
            .mapInPandas(_schema_of, "s string").collect())
    if not head:
        raise FileNotFoundError(f"no Avro files under {paths!r}")
    avro_schema = json.loads(head[0][0])
    if reader_schema is not None:
        # reader-schema override (spark-avro's avroSchema option / the
        # reference's avro.reader.schema): decode with the writer schema,
        # project onto the reader schema with defaults for new fields
        reader = avro_codec.normalize_schema(reader_schema)
        avro_codec.resolve_records([], avro_schema, reader)  # validate now
        out_schema = reader
    else:
        out_schema = avro_schema
    spark_type, top_nullable = avro_codec.avro_to_spark_type(out_schema)
    from pyspark.sql import types as T

    if isinstance(spark_type, T.StructType) and top_nullable:
        # union[null, record] top level decodes null records as all-null
        # rows, so every column must accept nulls
        spark_type = T.StructType([
            T.StructField(f.name, f.dataType, True)
            for f in spark_type.fields])
    if not isinstance(spark_type, T.StructType):
        # non-record top level (e.g. Avro key files of long/string):
        # surface as a single `value` column like spark-avro does
        spark_type = T.StructType([T.StructField("value", spark_type, True)])
        wrap = True
    else:
        wrap = False

    names = [f.name for f in spark_type.fields]

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                wschema, values = avro_codec.read_container(bytes(content))
                if not values:
                    # empty container (schema-only part file): yield
                    # nothing — pandas gives empty columns float64 dtype,
                    # which Arrow can't cast to list/struct types
                    continue
                if reader_schema is not None:
                    values = avro_codec.resolve_records(
                        values, wschema,
                        avro_codec.normalize_schema(reader_schema))
                if wrap:
                    rows = {"value": values}
                else:
                    # v may be None for union[null, record] top levels —
                    # surface as an all-null row rather than crashing
                    rows = {n: [None if v is None else v.get(n)
                                for v in values] for n in names}
                yield pd.DataFrame(rows, columns=names)

    return bin_df.select("content").mapInPandas(_decode, spark_type)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite",
               options: dict | None = None,
               nsplits: int | None = None) -> None:
    options = options or {}
    if spark_avro_jar_available(df.sparkSession):
        out = df.coalesce(nsplits) if nsplits else df
        (out.write.mode(mode).format("avro").options(**options).save(path))
        return
    _write_avro_fallback(df, path, mode=mode,
                         codec=options.get("compression", "deflate"),
                         nsplits=nsplits)


def _write_avro_fallback(df: DataFrame, path: str, mode: str = "overwrite",
                         codec: str = "deflate",
                         nsplits: int | None = None) -> None:
    if codec not in ("null", "deflate", "uncompressed"):
        raise ValueError(f"fallback Avro writer supports null/deflate, "
                         f"got {codec!r}")
    if codec == "uncompressed":
        codec = "null"
    if os.path.exists(path):
        if mode == "overwrite":
            shutil.rmtree(path)
        elif mode in ("error", "errorifexists"):
            raise FileExistsError(path)
        elif mode == "ignore":
            return
        # append: keep existing part files; new parts get fresh names
    os.makedirs(path, exist_ok=True)
    avro_schema = avro_codec.spark_schema_to_avro(df.schema)
    schema_json = json.dumps(avro_schema)
    suffix = ""
    if mode == "append":
        suffix = f"-{len(os.listdir(path)):04d}"
    out = df.coalesce(nsplits) if nsplits else df

    def _write_part(idx, rows):
        it = iter(rows)
        first = next(it, None)
        if first is None and idx != 0:
            return iter(())  # skip empty shards; part 0 always written
        import itertools

        head = [] if first is None else [first]
        values = (r.asDict(recursive=True)
                  for r in itertools.chain(head, it))
        data = avro_codec.write_container(schema_json, values, codec=codec)
        fname = os.path.join(path, f"part-{idx:05d}{suffix}.avro")
        with open(fname, "wb") as f:
            f.write(data)
        return iter((fname,))

    out.rdd.mapPartitionsWithIndex(_write_part).count()
    # part 0 may have been empty AND skipped on a >0-partition df; ensure
    # at least one file exists so readers can recover the schema
    if not any(n.endswith(".avro") for n in os.listdir(path)):
        with open(os.path.join(path, f"part-00000{suffix}.avro"), "wb") as f:
            f.write(avro_codec.write_container(schema_json, [], codec=codec))
    open(os.path.join(path, "_SUCCESS"), "w").close()
