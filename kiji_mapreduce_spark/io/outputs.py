"""Job outputs: sinks + the bulk-staging/commit pipeline.

Reference formats (``JobOutputSpec.java:53-66``): ``kiji, text, seq, map,
avro, avrokv, hfile`` with an ``@nsplits`` shard count. Spark mapping:

- text/csv/avro/parquet -> ``df.coalesce(n).write.*``
- kiji (direct table)   -> append/overwrite parquet table (the analogue of
  DirectKijiTableWriterContext's buffered puts — Spark writers batch
  natively)
- hfile (bulk staging)  -> ``repartitionByRange(key).sortWithinPartitions``
  sorted parquet staging + atomic directory-rename commit: the Spark-native
  version of TotalOrderPartitioner + KijiHFileOutputFormat + HFileLoader
  (``.../output/HFileMapReduceJobOutput.java:244-299``,
  ``.../HFileLoader.java:43-76``). Range partitioning samples boundaries
  exactly like the reference derives region splits; honoring an EXISTING
  table's boundaries is supported via explicit bucket ids.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class JobOutput:
    """Declarative output spec."""

    format: str
    path: str = ""
    nsplits: int | None = None
    mode: str = "overwrite"
    options: dict[str, str] = field(default_factory=dict)
    key_cols: list[str] = field(default_factory=lambda: ["entity_id"])
    #: hive-style partition columns for file outputs (date partitioning is
    #: the standard 100 TB layout: partition pruning on every read)
    partition_by: list[str] = field(default_factory=list)

    def save(self, df: DataFrame) -> None:
        n = self.nsplits
        fmt = self.format
        if fmt == "text":
            out = df
            if len(df.columns) > 1:
                # text sink takes one string column; join K/V with a tab
                # like Hadoop TextOutputFormat
                out = df.select(F.concat_ws("\t", *[
                    F.col(c).cast("string") for c in df.columns]).alias("value"))
            else:
                out = df.select(F.col(df.columns[0]).cast("string").alias("value"))
            (out.coalesce(n) if n else out).write.mode(self.mode).text(self.path)
            return
        if fmt == "csv":
            w = (df.coalesce(n) if n else df).write.mode(self.mode).options(**self.options)
            w.csv(self.path)
            return
        if fmt in ("avro", "avrokv"):
            (df.coalesce(n) if n else df).write.mode(self.mode) \
                .format("avro").options(**self.options).save(self.path)
            return
        if fmt in ("seq", "map"):
            # SequenceFile/MapFile: K/V pairs via the RDD API
            rdd = df.rdd.map(lambda r: (str(r[0]), str(r[1])))
            rdd.saveAsSequenceFile(self.path)
            return
        if fmt in ("kiji", "table", "parquet"):
            if fmt == "kiji" and os.path.exists(
                    os.path.join(self.path, "_kiji_layout.json")):
                # target is an entity table: upsert rows through the
                # table's atomic write path instead of raw parquet
                from kiji_mapreduce_spark.table import EntityTable

                EntityTable.open(df.sparkSession, self.path).upsert_rows(df)
                return
            w = (df.repartition(n) if n else df).write.mode(self.mode) \
                .options(**self.options)
            if self.partition_by:
                w = w.partitionBy(*self.partition_by)
            w.parquet(self.path)
            return
        if fmt == "hfile":
            stage_sorted(df, self.path, key_cols=self.key_cols, nsplits=self.nsplits)
            return
        raise ValueError(f"unknown output format {self.format!r}")


def job_output(spec: str) -> JobOutput:
    """Parse ``"format=text file=/out nsplits=8"`` / ``"format=hfile@8 ..."``."""
    parts = dict(p.split("=", 1) for p in spec.split() if "=" in p)
    fmt = parts.get("format", "")
    nsplits = None
    if "@" in fmt:
        fmt, _, ns = fmt.partition("@")
        nsplits = int(ns)
    if "nsplits" in parts:
        nsplits = int(parts["nsplits"])
    partition_by = [c for c in parts.get("partition_by", "").split(",") if c]
    return JobOutput(
        format=fmt, path=parts.get("file", parts.get("table", "")),
        nsplits=nsplits,
        options={k: v for k, v in parts.items()
                 if k not in ("format", "file", "table", "nsplits",
                              "partition_by")},
        partition_by=partition_by,
    )


def stage_sorted(df: DataFrame, staging_path: str,
                 key_cols: list[str] | None = None,
                 nsplits: int | None = None,
                 bucket_expr: Column | None = None) -> None:
    """Bulk staging: globally range-partitioned, within-partition sorted
    parquet — the reference's HFile pipeline in one Spark job.

    ``bucket_expr`` (optional) pins rows to precomputed bucket ids, the
    analogue of honoring an existing table's region boundaries
    (``HFileMapReduceJobOutput.makeTableKeySplit``, `:182-230`); without
    it Spark samples range boundaries (the reference's sampled
    TotalOrderPartitioner path).
    """
    key_cols = key_cols or ["entity_id"]
    keys = [F.col(c) for c in key_cols]
    if bucket_expr is not None:
        staged = df.repartition(bucket_expr).sortWithinPartitions(*keys)
    elif nsplits:
        staged = df.repartitionByRange(nsplits, *keys).sortWithinPartitions(*keys)
    else:
        staged = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
    staged.write.mode("overwrite").parquet(staging_path)


def write_bucketed(df: DataFrame, table_name: str, keys: list[str],
                   n_buckets: int = 16, sort_keys: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed catalog table (``bucketBy`` + ``sortBy``).

    Two tables bucketed identically on their join key equi-join with NO
    shuffle on either side — the 100 TB replacement for re-shuffling a
    fact table on every join (the reference co-located via HBase regions;
    Spark buckets are the analogue). Requires the session catalog (any
    warehouse dir works; no Hive needed).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    writer = writer.sortBy(*(sort_keys or keys))
    writer.saveAsTable(table_name)


def bulk_load(staging_path: str, table_path: str) -> None:
    """Commit staged files into the live table atomically — the analogue
    of ``HFileLoader.load`` + ``kiji bulk-load`` (``KijiBulkLoad.java:46``).

    Parquet tables: stage next to the target and atomic-rename into place
    (same-filesystem rename, like HBase's bulk-load file moves).
    """
    parent = os.path.dirname(os.path.abspath(table_path)) or "."
    os.makedirs(parent, exist_ok=True)
    if os.path.exists(table_path):
        trash = tempfile.mkdtemp(prefix=".bulkload-old-", dir=parent)
        shutil.move(table_path, os.path.join(trash, "old"))
        shutil.move(staging_path, table_path)
        shutil.rmtree(trash, ignore_errors=True)
    else:
        shutil.move(staging_path, table_path)
