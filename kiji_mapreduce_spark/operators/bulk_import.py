"""BulkImporter: parse external records -> puts into an entity table.

Reference: ``KijiBulkImporter.produce(K, V, KijiTableContext)``
(``.../bulkimport/KijiBulkImporter.java:92,163``) — each input record may
produce any number of puts to any rows/columns. On Spark an import is a
DataFrame transformation from the raw source rows to the table's schema:

- expression style: override ``import_df`` (withColumn/select — JVM-side);
- python style: override ``import_pandas`` + ``import_output_schema``.

Counters BULKIMPORTER_RECORDS_{PROCESSED,REJECTED} mirror
``.../bulkimport/impl/BulkImportMapper.java:68-83`` and are observed by the
job layer; rejected records are rows ``import_df`` drops (the job builder
can count them via an anti-diff when asked).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from kiji_mapreduce_spark.operators.base import Operator, OperatorContext


class BulkImporter(Operator):
    COUNTER_PREFIX = "BULKIMPORTER"

    import_output_schema: str | None = None

    def import_df(self, df: DataFrame, context: OperatorContext) -> DataFrame:
        if type(self).import_pandas is not BulkImporter.import_pandas:
            if not self.import_output_schema:
                raise ValueError("python-style importer needs import_output_schema")
            return df.mapInPandas(self.import_pandas, self.import_output_schema)
        raise NotImplementedError("override import_df or import_pandas")

    def import_pandas(self, batches: Iterator) -> Iterator:  # pragma: no cover
        raise NotImplementedError

    def compile(self, df: DataFrame, context: OperatorContext | None = None) -> DataFrame:
        context = context or OperatorContext()
        self.setup(context)
        out = self.import_df(df, context)
        self.cleanup(context)
        return out
