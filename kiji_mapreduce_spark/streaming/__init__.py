from kiji_mapreduce_spark.streaming.jobs import (
    drain_to_memory,
    stream_operator, windowed_aggregate, sessionized_aggregate,
    running_latest, stream_into_table,
    stream_dedup_exact, stream_interval_join,
    stream_rollup_into_table, table_change_stream,
    stream_countmin,
    stream_drift,
    stream_media_dedup,
)

__all__ = ["drain_to_memory", "stream_operator", "windowed_aggregate",
           "sessionized_aggregate", "running_latest",
           "stream_into_table", "stream_dedup_exact",
           "stream_interval_join", "stream_rollup_into_table",
           "table_change_stream", "stream_countmin", "stream_drift",
           "stream_media_dedup"]
