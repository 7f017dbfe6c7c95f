"""Benchmark harness: runs the suite's queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop data source (full compute,
no sink cost, no driver collect)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from kiji_mapreduce_spark.session import make_session
    from kiji_mapreduce_spark import suite

    spark = make_session(
        app_name="kiji-mr-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    # JVM/codegen warm-up covering the scan/shuffle/agg/join machinery so
    # the first measured query isn't charged for JIT + class loading
    from pyspark.sql import functions as F
    warm = spark.range(100000).withColumn("k", F.pmod("id", F.lit(100)))
    warm.groupBy("k").count().join(
        F.broadcast(spark.range(100).withColumnRenamed("id", "k")), "k"
    ).write.mode("overwrite").format("noop").save()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in suite.QUERIES.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query must not hide the rest
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)
    spark.stop()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
