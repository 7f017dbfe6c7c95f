"""Avro container read/write for Spark, jar-or-fallback.

The spark-avro DataSource is an external jar; when it is on the
classpath these helpers use it (it splits within big files on sync
markers — the right choice at 100 TB). When it is absent they fall back
to the pure-Python codec in ``avro_codec.py``:

- **read** (local filesystem): files are carved into byte-range splits
  and each split decodes the sync-marker-delimited blocks it owns
  (``avro_codec.read_container_split``) — the same intra-file
  splittability the jar provides, so one huge container file still
  parallelizes across tasks. Only (path, length) metadata reaches the
  driver.
- **read** (non-local FS): ``binaryFile`` scan (one row per file, never
  split) -> ``mapInPandas`` decode, parallel across files only. Schema
  comes from one file's header, read on an executor.
- **write**: one container file per partition via
  ``mapPartitionsWithIndex`` — distributed encode, local-filesystem
  destinations (the test/staging shape; cluster deployments ship the
  jar).

``ordered=True`` attaches an ``_ord`` struct column — (file path, split
byte offset, within-split row index) — that sorts in (lexicographic
path, within-file record) order on EVERY path, jar or fallback. The KV
stores window over it for first-record-wins semantics
(``AvroRecordKeyValueStore.java:307``); without it the jar's bin-packed,
size-descending scan order would make the winning duplicate
nondeterministic (ADVICE r4).

Mirrors the reference's first-class Avro formats
(``MapReduceJobInputs.java:112-143``, ``MapReduceJobOutputs.java``).
"""

from __future__ import annotations

import json
import os
import re
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
              options: dict | None = None,
              ordered: bool = False) -> DataFrame:
    options = options or {}
    if spark_avro_jar_available(spark):
        df = spark.read.format("avro").options(**options).load(paths)
        if ordered:
            from pyspark.sql import functions as F

            # the jar bin-packs splits size-descending, so raw id order
            # does not follow path order; rebuild file order from the
            # hidden _metadata columns. Within one split, ids increase in
            # record order, so (path, block start, id) sorts in exact
            # file order even when a file was split.
            df = df.select("*", F.struct(
                F.col("_metadata.file_path").alias("p"),
                F.col("_metadata.file_block_start").alias("b"),
                F.monotonically_increasing_id().alias("i")).alias("_ord"))
        return df
    return _read_avro_fallback(spark, paths,
                               reader_schema=options.get("avroSchema"),
                               ordered=ordered)


def _local_path(uri: str) -> str | None:
    """file:/... or bare-path URI -> local path; None for other schemes."""
    from urllib.parse import unquote, urlparse

    u = urlparse(uri)
    return unquote(u.path) if u.scheme in ("", "file") else None


def _plan_output(avro_schema, reader_schema: str | None):
    """Choose the output schema -> (spark StructType, column names,
    wrap-non-record-top-level?, normalized reader schema or None).
    Reader-schema overrides (spark-avro's avroSchema option / the
    reference's avro.reader.schema) are validated up front."""
    from pyspark.sql import types as T

    if reader_schema is not None:
        reader = avro_codec.normalize_schema(reader_schema)
        avro_codec.resolve_records([], avro_schema, reader)  # validate now
        out_schema = reader
    else:
        reader = None
        out_schema = avro_schema
    spark_type, top_nullable = avro_codec.avro_to_spark_type(out_schema)
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
    return spark_type, [f.name for f in spark_type.fields], wrap, reader


def _project(values, wschema, avro_schema, reader, path: str):
    """Per-file schema handling: resolve onto the reader schema when one
    was given; otherwise first-file-schema-wins — a later file written
    with a DIFFERENT schema is resolved onto the first file's schema when
    the spec allows, else fails naming the offending file (ADVICE r4:
    silent per-name projection gave Nones / opaque Arrow errors)."""
    target = reader if reader is not None else avro_schema
    if reader is None and wschema == avro_schema:
        return values
    try:
        return avro_codec.resolve_records(values, wschema, target)
    except ValueError as e:
        raise ValueError(
            f"Avro schema mismatch in {path}: {e}") from e


def _rows(values, names, wrap: bool) -> dict:
    if wrap:
        return {"value": values}
    # v may be None for union[null, record] top levels — surface as an
    # all-null row rather than crashing
    return {n: [None if v is None else v.get(n) for v in values]
            for n in names}


def _with_ord(spark_type):
    from pyspark.sql import types as T

    return T.StructType(list(spark_type.fields) + [
        T.StructField("_ord", T.StructType([
            T.StructField("p", T.StringType(), False),
            T.StructField("b", T.LongType(), False),
            T.StructField("i", T.LongType(), False)]), False)])


def _read_avro_fallback(spark: SparkSession, paths: list[str],
                        reader_schema: str | None = None,
                        ordered: bool = False) -> DataFrame:
    # binaryFile prunes the content column, so this collects only
    # (path, length) metadata — same driver-side footprint as Spark's
    # own file listing
    meta = (spark.read.format("binaryFile").load(paths)
            .select("path", "length").orderBy("path").collect())
    if not meta:
        raise FileNotFoundError(f"no Avro files under {paths!r}")
    local = [_local_path(r.path) for r in meta]
    if all(p is not None for p in local):
        return _read_fallback_ranged(
            spark, local, [r.length for r in meta], reader_schema, ordered)
    return _read_fallback_wholefile(spark, paths, reader_schema, ordered)


def _read_fallback_ranged(spark: SparkSession, files: list[str],
                          lengths: list[int],
                          reader_schema: str | None,
                          ordered: bool) -> DataFrame:
    """Local-FS read with intra-file byte-range splits: each task decodes
    the sync-marker-delimited blocks its range owns, so one huge
    container file parallelizes like the jar path does
    (``MapReduceJobInputs.java:112-143`` splittability without the jar)."""
    import math

    split_bytes = int(spark.conf.get(
        "kiji.avro.fallback.split.bytes", str(128 << 20)))
    with open(files[0], "rb") as f:
        avro_schema = avro_codec.read_file_header(f)[0]
    spark_type, names, wrap, reader = _plan_output(avro_schema,
                                                   reader_schema)
    out_type = _with_ord(spark_type) if ordered else spark_type
    out_cols = names + ["_ord"] if ordered else names

    splits = []
    for p, ln in zip(files, lengths):
        for i in range(max(1, math.ceil(ln / split_bytes))):
            splits.append((p, i * split_bytes,
                           min((i + 1) * split_bytes, ln)))
    # one task per split up to a few waves of the cluster's parallelism;
    # beyond that, round-robin packs several splits per task rather than
    # asking the scheduler for hundreds of thousands of one-row tasks
    n_parts = min(len(splits),
                  max(64, spark.sparkContext.defaultParallelism * 4))
    sdf = (spark.createDataFrame(splits, "path string, start long, end long")
           .repartition(n_parts))

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for path, start, end in zip(pdf["path"], pdf["start"],
                                        pdf["end"]):
                wschema, values = avro_codec.read_container_split(
                    path, int(start), int(end))
                if not values:
                    # empty split (or schema-only part file): yield
                    # nothing — pandas gives empty columns float64 dtype,
                    # which Arrow can't cast to list/struct types
                    continue
                values = _project(values, wschema, avro_schema, reader,
                                  path)
                rows = _rows(values, names, wrap)
                if ordered:
                    rows["_ord"] = [{"p": path, "b": int(start), "i": i}
                                    for i in range(len(values))]
                yield pd.DataFrame(rows, columns=out_cols)

    return sdf.mapInPandas(_decode, out_type)


def _read_fallback_wholefile(spark: SparkSession, paths: list[str],
                             reader_schema: str | None,
                             ordered: bool) -> DataFrame:
    """Non-local-FS read: whole files via binaryFile (never split),
    decode parallel across files. Schema comes from ONE file's header,
    decoded executor-side — only the JSON schema string is collected."""
    bin_df = spark.read.format("binaryFile").load(paths).orderBy("path")

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
    spark_type, names, wrap, reader = _plan_output(avro_schema,
                                                   reader_schema)
    out_type = _with_ord(spark_type) if ordered else spark_type
    out_cols = names + ["_ord"] if ordered else names

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                wschema, values = avro_codec.read_container(bytes(content))
                if not values:
                    continue
                values = _project(values, wschema, avro_schema, reader,
                                  path)
                rows = _rows(values, names, wrap)
                if ordered:
                    rows["_ord"] = [{"p": path, "b": 0, "i": i}
                                    for i in range(len(values))]
                yield pd.DataFrame(rows, columns=out_cols)

    return bin_df.select("path", "content").mapInPandas(_decode, out_type)


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
    # local-filesystem writer: a scheme path (s3://, hdfs://) would
    # os.makedirs a literal local "s3:/bucket" directory and "succeed"
    # without writing to the store — the silent-no-op class
    # (r13 review finding; write_webdataset raises for the same
    # reason). A relative path must pin to the DRIVER's cwd before the
    # closure captures it, or executors join part names against their
    # own scratch cwd.
    if re.match(r"^[a-z][a-z0-9+.-]*://", path, re.IGNORECASE):
        if path.lower().startswith("file://"):
            path = path[len("file://"):]
        else:
            raise NotImplementedError(
                f"fallback Avro writer (spark-avro jar absent) writes "
                f"to local/shared filesystems only, got {path!r}")
    path = os.path.abspath(path)
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
