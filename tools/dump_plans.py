"""Dump ``.explain("formatted")`` for suite queries to files.

Usage: python tools/dump_plans.py OUT_DIR [SUFFIX] [QUERY ...]

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` (suffix defaults to "before")
for each named query, or for every registry + staged query when no
names are given.  Used to commit the optimization-round plan evidence
(plans/r14/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from kiji_mapreduce_spark.session import make_session
    from kiji_mapreduce_spark import suite

    spark = make_session(master="local[8]", shuffle_partitions=16,
                         extra_conf={
                             "spark.ui.enabled": "false",
                             "spark.sql.maxMetadataStringLength": "10000",
                         })
    all_queries = {**suite.QUERIES,
                   **{f"staged_{n}": f for n, f in suite.STAGED.items()}}
    if names:
        all_queries = {n: f for n, f in all_queries.items() if n in names}
    os.makedirs(out_dir, exist_ok=True)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, fn in all_queries.items():
        if name == "streaming_windowed_counts":
            continue  # streaming plans are not explainable pre-start
        try:
            df = fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # keep dumping the rest
            text = f"FAILED TO PLAN: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
