from kiji_mapreduce_spark.streaming.jobs import (
    stream_operator, windowed_aggregate, running_latest, stream_into_table,
    stream_dedup_exact,
)

__all__ = ["stream_operator", "windowed_aggregate", "running_latest",
           "stream_into_table", "stream_dedup_exact"]
