"""Gatherer: scan -> emit (K, V) pairs -> aggregate -> files.

Reference: ``KijiGatherer`` (``.../gather/KijiGatherer.java:100,158``) emits
arbitrary key/value pairs per row into a Hadoop shuffle with an optional
combiner and reducer. On Spark:

- ``gather_df``  = the flatMap stage (select / explode / transform) —
  expression style keeps it in whole-stage codegen;
- ``reduce_df``  = the aggregation; ``groupBy().agg()`` gives partial
  (map-side combine) + final aggregation automatically, so the reference's
  combiner concept needs no user code
  (``MapReduceJobBuilder.java:438-448`` -> Catalyst partial aggregation).

Python-style gatherers override ``gather_pandas`` (an iterator of
pandas DataFrames -> iterator of pandas DataFrames) and set
``gather_output_schema``; the engine wires ``mapInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from kiji_mapreduce_spark.operators.base import Operator, OperatorContext


class Gatherer(Operator):
    COUNTER_PREFIX = "GATHERER"

    #: DDL schema string for python-style gathering, e.g. "k string, v long"
    gather_output_schema: str | None = None

    # -- expression style --------------------------------------------------
    def gather_df(self, df: DataFrame, context: OperatorContext) -> DataFrame:
        """Emit the (key, value) rows. Default: python style if defined,
        else identity."""
        if type(self).gather_pandas is not Gatherer.gather_pandas:
            if not self.gather_output_schema:
                raise ValueError("python-style gatherer needs gather_output_schema")
            return df.mapInPandas(self.gather_pandas, self.gather_output_schema)
        return df

    def reduce_df(self, gathered: DataFrame, context: OperatorContext) -> DataFrame:
        """Aggregate the gathered pairs. Default: pass-through (map-only
        gather job, like a gatherer with no reducer)."""
        return gathered

    # -- python style ------------------------------------------------------
    def gather_pandas(self, batches: Iterator) -> Iterator:  # pragma: no cover
        raise NotImplementedError

    # -- compilation -------------------------------------------------------
    def compile(self, df: DataFrame, context: OperatorContext | None = None) -> DataFrame:
        context = context or OperatorContext()
        self.setup(context)
        projected = self.apply_request(df)
        gathered = self.gather_df(projected, context)
        reduced = self.reduce_df(gathered, context)
        self.cleanup(context)
        return reduced
