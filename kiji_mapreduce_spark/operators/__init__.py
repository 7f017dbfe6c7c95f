"""The five KijiMR job archetypes, Spark-first (SURVEY.md §2.3).

Each archetype is an abstract class the user subclasses, mirroring the
reference lifecycle (``setup -> N x process -> cleanup``) but compiled to
declarative DataFrame pipelines. Every archetype supports two styles:

- **expression style** (the fast path): override the ``*_df`` hook and
  express the computation with pyspark.sql functions — stays JVM-side in
  whole-stage codegen;
- **python style** (the escape hatch): override the pandas hook; the engine
  compiles it to ``mapInPandas``/``applyInPandas`` (Arrow-batched).
"""

from kiji_mapreduce_spark.operators.base import Operator, OperatorContext
from kiji_mapreduce_spark.operators.bulk_import import BulkImporter
from kiji_mapreduce_spark.operators.produce import Producer
from kiji_mapreduce_spark.operators.gather import Gatherer
from kiji_mapreduce_spark.operators.pivot import Pivoter, CellRewriter
from kiji_mapreduce_spark.operators.mapreduce import MapReduceOperator, TableReducer

__all__ = [
    "Operator", "OperatorContext", "BulkImporter", "Producer", "Gatherer",
    "Pivoter", "CellRewriter", "MapReduceOperator", "TableReducer",
]
