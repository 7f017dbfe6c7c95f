"""Generic map/reduce operators + table reducer.

Reference: ``KijiMapReduceJobBuilder`` wires arbitrary mapper/combiner/
reducer classes (``.../KijiMapReduceJobBuilder.java:45,96-132``);
``KijiTableReducer`` reduces (K, Iterable<V>) into table puts
(``.../KijiTableReducer.java:57,100``). On Spark:

- map stage  -> expression transform or ``mapInPandas``
- combine    -> automatic (Catalyst partial aggregation)
- reduce     -> ``groupBy(keys).agg(exprs)`` (expression style) or
                ``applyInPandas`` (python style, full group in memory —
                only for groups that fit, exactly like a Hadoop reducer's
                Iterable could stream but users rarely did)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame

from kiji_mapreduce_spark.operators.base import Operator, OperatorContext


class MapReduceOperator(Operator):
    COUNTER_PREFIX = "MAPREDUCE"

    map_output_schema: str | None = None
    reduce_output_schema: str | None = None

    def group_keys(self) -> list[str]:
        return []

    # -- map stage ---------------------------------------------------------
    def map_df(self, df: DataFrame, context: OperatorContext) -> DataFrame:
        if type(self).map_pandas is not MapReduceOperator.map_pandas:
            if not self.map_output_schema:
                raise ValueError("python-style mapper needs map_output_schema")
            return df.mapInPandas(self.map_pandas, self.map_output_schema)
        return df

    def map_pandas(self, batches: Iterator) -> Iterator:  # pragma: no cover
        raise NotImplementedError

    # -- reduce stage ------------------------------------------------------
    def reduce_exprs(self, context: OperatorContext) -> list[Column] | None:
        """Aggregate expressions for groupBy().agg(); None = no reduce."""
        return None

    def reduce_pandas(self, key, pdf):  # pragma: no cover
        raise NotImplementedError

    def reduce_df(self, mapped: DataFrame, context: OperatorContext) -> DataFrame:
        exprs = self.reduce_exprs(context)
        if exprs is not None:
            keys = self.group_keys()
            return mapped.groupBy(*keys).agg(*exprs) if keys else mapped.agg(*exprs)
        if type(self).reduce_pandas is not MapReduceOperator.reduce_pandas:
            if not self.reduce_output_schema:
                raise ValueError("python-style reducer needs reduce_output_schema")
            return mapped.groupBy(*self.group_keys()).applyInPandas(
                self.reduce_pandas, self.reduce_output_schema)
        return mapped

    def compile(self, df: DataFrame, context: OperatorContext | None = None) -> DataFrame:
        context = context or OperatorContext()
        self.setup(context)
        out = self.reduce_df(self.map_df(self.apply_request(df), context), context)
        self.cleanup(context)
        return out


class TableReducer(MapReduceOperator):
    """Reduce straight into table rows (aggregate + upsert): the result of
    ``compile`` is keyed rows ready for a MERGE into an entity table."""

    COUNTER_PREFIX = "TABLEREDUCER"
