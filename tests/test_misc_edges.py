"""Edge cases in thinner-covered paths: session helpers, job error
propagation, layout serialization, request edge semantics."""

import pytest
from pyspark.sql import functions as F

from kiji_mapreduce_spark.job import GatherJobBuilder
from kiji_mapreduce_spark.layout import TableLayout
from kiji_mapreduce_spark.operators import Gatherer
from kiji_mapreduce_spark.session import load_tables


def test_load_tables_registers_views(spark, sf_dir):
    tables = load_tables(spark, sf_dir, ["nation", "region"])
    assert set(tables) == {"nation", "region"}
    assert spark.sql("SELECT count(*) AS n FROM nation").first().n == 25
    # missing tables are skipped, not errors
    assert load_tables(spark, "/nonexistent", ["nation"]) == {}


class ExplodingGatherer(Gatherer):
    def gather_df(self, df, ctx):
        # analysis-time failure: unknown column
        return df.select("no_such_column")


def test_submitted_job_propagates_errors(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(Exception):
        job = (GatherJobBuilder().with_input(df)
               .with_gatherer(ExplodingGatherer()).build())
        job.submit()
        job.join(60)


def test_layout_map_family_roundtrip():
    layout = TableLayout.from_json("""
    {"name": "t", "families": [
      {"name": "mm", "kind": "map", "map_schema": "long",
       "max_versions": 7, "ttl_seconds": 3600}]}
    """)
    again = TableLayout.from_json(layout.to_json())
    fam = again.family("mm")
    assert fam.kind == "map" and fam.max_versions == 7
    assert fam.ttl_seconds == 3600
    assert again.spark_schema()["mm"].dataType.simpleString() == \
        "map<string,array<struct<ts:bigint,value:bigint>>>"
    with pytest.raises(KeyError):
        again.family("nope")


def test_empty_cells_are_null_safe(spark):
    from kiji_mapreduce_spark import cells

    df = spark.createDataFrame(
        [(1, []), (2, None)], "id int, c array<struct<ts:long,value:string>>")
    out = df.select(
        "id",
        cells.latest_value(F.col("c")).alias("lv"),
        cells.value_at(F.col("c"), 100).alias("va"),
    ).collect()
    assert all(r.lv is None and r.va is None for r in out)


def test_session_window_exact_gap_boundary(spark):
    """Events exactly `gap` apart MERGE into one session (Spark merges
    touching windows), so the SQL oracle's strictly-greater split
    condition (`diff > gap_ms`) is the correct mirror — verified here so
    the boundary semantics stay pinned (raised as a suspected mismatch
    in the r5 review; empirically NOT one)."""
    import datetime

    from pyspark.sql import functions as F

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    exact = t0 + datetime.timedelta(minutes=30)
    over = t0 + datetime.timedelta(minutes=30, milliseconds=1)
    df = spark.createDataFrame(
        [(1, t0), (1, exact), (2, t0), (2, over)],
        "user long, ts timestamp")
    out = (df.groupBy("user", F.session_window("ts", "30 minutes"))
           .agg(F.count(F.lit(1)).alias("n")))
    per_user = {}
    for r in out.collect():
        per_user[r.user] = per_user.get(r.user, 0) + 1
    assert per_user == {1: 1, 2: 2}  # exact gap merges; gap+1ms splits


def test_bench_line_fits_driver_tail_capture():
    """The round driver records only the last 2000 chars of stdout; the
    full 100-query payload outgrew that at r2 and every BENCH_r{2..9}
    recorded "parsed": null (r9 ADVICE). bench_line must emit a complete,
    parseable JSON line under budget with priority names kept first."""
    import json

    import bench
    from kiji_mapreduce_spark import suite

    # worst realistic case: every registry query name, long-ish medians
    timings = {name: 123.456 for name in suite.QUERIES}
    priority = set(list(suite.QUERIES)[:49])
    line = bench.bench_line(timings, 999.999, 0.1, 3, 2, priority)
    assert len(line) <= 2000 - 100  # headroom the driver tail needs
    payload = json.loads(line)
    assert payload["value"] == 999.999
    assert payload["n_queries"] == len(suite.QUERIES)
    assert payload["queries_full"] == "BENCH_LOCAL.json"
    # every priority (baseline-common) query survives the budget cut
    assert priority <= set(payload["queries"])
    # and the budget actually bit: not everything fits
    assert len(payload["queries"]) < len(timings)


def test_bench_line_small_suite_includes_everything():
    import json

    import bench

    timings = {f"q{i}": 1.0 for i in range(10)}
    payload = json.loads(bench.bench_line(timings, 10.0, 0.01, 1, 0))
    assert set(payload["queries"]) == set(timings)
