"""Aggregate the _job_history table into per-job timing/throughput stats —
the analogue of the reference's profiling aggregation script
(``kiji-mapreduce/src/main/profiling/scripts/kijistats.py:17-40``) over the
job-history table instead of AspectJ CSV dumps.

Usage: python tools/jobstats.py /path/to/_job_history [job_name]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def job_stats(df, name_filter: str | None = None):
    """Per-job-name timing/throughput rollup over a _job_history frame:
    runs, failures, wall-clock avg/max, total rows (from whichever
    operator counter the job recorded), rows/s."""
    from pyspark.sql import functions as F

    if name_filter:
        df = df.filter(F.col("job_name") == name_filter)
    rows_expr = F.coalesce(*[
        F.get_json_object("job_counters", f"$.{c}").cast("long")
        for c in ("GATHERER_ROWS_PROCESSED", "PRODUCER_ROWS_PROCESSED",
                  "BULKIMPORTER_ROWS_PROCESSED", "PIVOTER_ROWS_PROCESSED",
                  "MAPREDUCE_ROWS_PROCESSED", "TABLEREDUCER_ROWS_PROCESSED",
                  # the base prefix: a direct Operator subclass records
                  # OPERATOR_ROWS_PROCESSED, which reported NULL
                  # total_rows here (r13 review finding)
                  "OPERATOR_ROWS_PROCESSED")
    ])
    wall_s = (F.col("job_end_time") - F.col("job_start_time")) / 1000.0
    return (
        df.withColumn("_rows", rows_expr).withColumn("_wall_s", wall_s)
        .groupBy("job_name")
        .agg(
            F.count(F.lit(1)).alias("runs"),
            F.sum(F.when(F.col("job_end_status") != "SUCCEEDED", 1)
                  .otherwise(0)).alias("failures"),
            F.round(F.avg("_wall_s"), 3).alias("avg_wall_s"),
            F.round(F.max("_wall_s"), 3).alias("max_wall_s"),
            F.sum("_rows").alias("total_rows"),
            F.round(F.sum("_rows") / F.sum("_wall_s"), 1).alias("rows_per_s"),
        )
        .orderBy("job_name")
    )


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    path = sys.argv[1]
    name_filter = sys.argv[2] if len(sys.argv) > 2 else None

    from kiji_mapreduce_spark.session import make_session

    spark = make_session(app_name="kiji-jobstats", master="local[4]",
                         shuffle_partitions=4,
                         extra_conf={"spark.ui.enabled": "false"})
    stats = job_stats(spark.read.parquet(path), name_filter)
    for r in stats.collect():
        print(json.dumps(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
