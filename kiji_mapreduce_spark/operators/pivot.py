"""Pivoter: table -> table map (possibly different table / different keys),
and the stock CellRewriter pivoter (schema migration).

Reference: ``KijiPivoter`` (``.../pivot/KijiPivoter.java:93,168``) reads
rows of an input table and writes cells to any row/column of an output
table. On Spark that is a transformation producing rows keyed by the NEW
entity key, then a repartition-by-key write (the shuffle the reference got
from its identity reduce + TotalOrderPartitioner).

``CellRewriter`` mirrors ``KijiCellRewriter``
(``.../pivot/KijiCellRewriter.java:76,183-269``): apply a chain of
schema-conversion rules to every version of a column until fixpoint,
preserving per-cell timestamps, counting CELLS_PROCESSED/CELLS_REWRITTEN.
Rule chains are followed transitively with cycle detection (the reference
left chaining as TODO(KIJIMR-264)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kiji_mapreduce_spark.cells import rewrite_values
from kiji_mapreduce_spark.operators.base import Operator, OperatorContext


class Pivoter(Operator):
    COUNTER_PREFIX = "PIVOTER"

    def pivot_df(self, df: DataFrame, context: OperatorContext) -> DataFrame:
        """Rows for the output table (must include its entity key)."""
        raise NotImplementedError

    def output_key(self) -> list[str]:
        """Output-table key columns; the engine repartitions on them so
        the write is clustered like the reference's sorted HFile staging."""
        return ["entity_id"]

    def compile(self, df: DataFrame, context: OperatorContext | None = None,
                repartition: bool = True) -> DataFrame:
        context = context or OperatorContext()
        self.setup(context)
        out = self.pivot_df(self.apply_request(df), context)
        if repartition:
            out = out.repartition(*[F.col(c) for c in self.output_key()])
        self.cleanup(context)
        return out


class CellRewriter(Pivoter):
    """Schema-migration pivoter over one versioned column.

    ``rules`` maps type-name -> type-name (e.g. {"int": "long"}); chains
    (int->long->double) are resolved transitively up front, with cycle
    detection, then applied as a single cast preserving timestamps.

    Record-typed cells (``KijiCellRewriter.java:250-269`` converts between
    record schemas with Avro reader/writer resolution): pass
    ``record_target`` (a StructType or any layout cell-schema declaration)
    and optional ``record_defaults`` for fields new in the target; fields
    are matched by name, dropped fields discarded, timestamps preserved.
    """

    def __init__(self, column: str, rules: dict[str, str] | None = None,
                 conf=None, record_target=None,
                 record_defaults: dict | None = None):
        super().__init__(conf)
        self.column = column
        self.rules = dict(rules or {})
        if record_target is not None:
            from kiji_mapreduce_spark.layout import _resolve_type

            record_target = _resolve_type(record_target)
        self.record_target = record_target
        self.record_defaults = record_defaults

    def _final_type(self, start: str) -> str:
        seen, cur = {start}, start
        while cur in self.rules:
            cur = self.rules[cur]
            if cur in seen:
                raise ValueError(f"cell-rewrite rule cycle at {cur!r}")
            seen.add(cur)
        return cur

    def rewrite_column(self, cells: Column, from_type: str) -> Column:
        to_type = self._final_type(from_type)
        if to_type == from_type:
            return cells
        return rewrite_values(cells, lambda v: v.cast(to_type))

    def pivot_df(self, df: DataFrame, context: OperatorContext) -> DataFrame:
        from pyspark.sql.types import StructType

        from kiji_mapreduce_spark.cells import convert_record

        family, _, qualifier = self.column.partition(":")
        target = f"{family}.{qualifier}" if qualifier else family
        cells_col = F.col(target)
        # current value type, from the schema
        fam_type = df.schema[family].dataType
        if qualifier:
            cur_type = fam_type[qualifier].dataType.elementType["value"].dataType
        else:
            cur_type = fam_type.elementType["value"].dataType
        if self.record_target is not None:
            if not isinstance(cur_type, StructType):
                raise TypeError(
                    f"record_target set but column {self.column!r} holds "
                    f"{cur_type.simpleString()}, not a record")
            rewritten = rewrite_values(
                cells_col,
                lambda v: convert_record(v, cur_type, self.record_target,
                                         self.record_defaults))
        else:
            rewritten = self.rewrite_column(cells_col, cur_type.simpleString())
        if qualifier:
            return df.withColumn(family, F.col(family).withField(qualifier, rewritten))
        return df.withColumn(family, rewritten)

    def compile(self, df, context=None, repartition: bool = False):
        # same-key rewrite: no repartition needed (narrow plan)
        return super().compile(df, context, repartition=repartition)
