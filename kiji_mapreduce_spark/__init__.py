"""kiji_mapreduce_spark — a PySpark-native analytics engine with the
capabilities of kijiproject/kiji-mapreduce (KijiMR).

KijiMR is a MapReduce job framework over entity-centric, versioned,
Avro-typed tables. This package re-expresses that capability surface
Spark-first:

- entity tables  -> Parquet-backed DataFrames with layout-derived schemas
  (group families as structs, map families as MapType, versioned cells as
  ``array<struct<ts:long, value:T>>``)
- the five job archetypes (bulk-import / produce / gather / pivot /
  generic map-reduce) -> declarative DataFrame pipelines with an optional
  ``mapInPandas`` escape hatch
- KeyValueStores (map-side lookup joins) -> broadcast hash joins
- HFile bulk staging -> ``repartitionByRange().sortWithinPartitions()``
  sorted Parquet staging + atomic commit
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) the reference never had.

Everything is built on the public PySpark DataFrame / SQL API; Catalyst
performs the planning the reference did by hand (projection & predicate
pushdown, partial aggregation, broadcast joins, range partitioning).
"""

from kiji_mapreduce_spark.session import make_session
from kiji_mapreduce_spark.layout import TableLayout
from kiji_mapreduce_spark.request import DataRequest, ColumnRequest

__version__ = "0.1.0"

__all__ = [
    "make_session",
    "TableLayout",
    "DataRequest",
    "ColumnRequest",
    "__version__",
]
