"""Producer: per-row derived data written back to the SAME table/row.

Reference: ``KijiProducer`` (``.../produce/KijiProducer.java:101,140-183``)
reads requested columns of one row and writes cells to exactly one
configured output column (or map family) of the same row — the builder
enforces output table == input table
(``KijiProduceJobBuilder.java:168-171``). On Spark that is
``withColumn(out, expr)`` followed by a keyed merge back into the table; no
shuffle at all when the derive is expression-only (narrow plan).

The canonical doc example (email -> domain,
``KijiProducer.java:83-95``) lives in the test suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType

from kiji_mapreduce_spark.cells import put_cell
from kiji_mapreduce_spark.operators.base import Operator, OperatorContext


class Producer(Operator):
    COUNTER_PREFIX = "PRODUCER"

    def output_column(self) -> str:
        """``"family:qualifier"`` (single column) or ``"family"`` (map
        family) the producer writes to — reference ``getOutputColumn()``."""
        raise NotImplementedError

    def produce_expr(self, df: DataFrame, context: OperatorContext) -> Column:
        """The derived value, as a Column over the projected row."""
        raise NotImplementedError

    def produce_ts(self, df: DataFrame, context: OperatorContext) -> Column:
        """Timestamp for the derived cells; default 'latest' resolved at
        write time (reference HConstants.LATEST_TIMESTAMP semantics)."""
        return (F.unix_timestamp(F.current_timestamp()) * 1000).cast("long")

    def compile(self, df: DataFrame, context: OperatorContext | None = None) -> DataFrame:
        """Return the full table rows with the output cell updated.

        Versioned tables get a ``put_cell`` into the output column's array
        (same-row write-back); flat tables get a plain ``withColumn``.
        """
        context = context or OperatorContext()
        self.setup(context)
        value = self.produce_expr(self.apply_request(df), context)
        out = self.output_column()
        family, _, qualifier = out.partition(":")
        if qualifier and family in df.columns and isinstance(
            df.schema[family].dataType, StructType
        ):
            ts = self.produce_ts(df, context)
            updated = df.withColumn(
                family,
                F.col(family).withField(qualifier, put_cell(
                    F.col(f"{family}.{qualifier}"), ts, value)),
            )
        else:
            updated = df.withColumn(qualifier or family, value)
        self.cleanup(context)
        return updated
