"""Versioned-cell semantics (SURVEY.md §1.1 / §4 custom item 1).

Mirrors the reference's cell behavior: newest-first ordering, maxVersions
slicing, TTL, tombstones, ts-preserving rewrite (KijiCellRewriter)."""

from pyspark.sql import functions as F

from kiji_mapreduce_spark import cells

CELLS = "array<struct<ts:long,value:string>>"


def _cell_df(spark, data):
    return spark.createDataFrame([(1, data)], f"id int, c {CELLS}") \
        .select("id", cells.sort_cells(F.col("c")).alias("c"))


def test_latest_and_value_at(spark):
    df = _cell_df(spark, [(10, "a"), (30, "c"), (20, "b")])
    row = df.select(
        cells.latest_value(F.col("c")).alias("lv"),
        cells.value_at(F.col("c"), 25).alias("at25"),
        cells.value_at(F.col("c"), 5).alias("at5"),
    ).first()
    assert row.lv == "c"
    assert row.at25 == "b"
    assert row.at5 is None


def test_put_overwrites_equal_ts(spark):
    df = _cell_df(spark, [(10, "a"), (20, "b")])
    out = df.select(cells.put_cell(F.col("c"), 20, "B").alias("c"))
    got = [(c.ts, c.value) for c in out.first().c]
    assert got == [(20, "B"), (10, "a")]


def test_put_into_null_cell(spark):
    df = spark.createDataFrame([(1, None)], f"id int, c {CELLS}")
    out = df.select(cells.put_cell(F.col("c"), 5, "x").alias("c"))
    assert [(c.ts, c.value) for c in out.first().c] == [(5, "x")]


def test_retain_versions_and_ttl(spark):
    df = _cell_df(spark, [(10, "a"), (20, "b"), (30, "c"), (40, "d")])
    row = df.select(
        cells.retain_versions(F.col("c"), 2).alias("r2"),
        cells.expire_ttl(F.col("c"), ttl_seconds=1, now_ms=1030).alias("ttl"),
    ).first()
    assert [c.value for c in row.r2] == ["d", "c"]
    # ttl: keep ts >= 1030 - 1000 = 30 -> versions 30, 40
    assert [c.ts for c in row.ttl] == [40, 30]


def test_tombstones(spark):
    df = _cell_df(spark, [(10, "a"), (20, "b"), (30, "c")])
    row = df.select(
        cells.delete_cell(F.col("c"), 20).alias("dc"),
        cells.delete_upto(F.col("c"), 20).alias("du"),
    ).first()
    assert [c.ts for c in row.dc] == [30, 10]
    assert [c.ts for c in row.du] == [30]


def test_rewrite_preserves_ts(spark):
    df = spark.createDataFrame(
        [(1, [(20, 7), (10, 3)])], "id int, c array<struct<ts:long,value:int>>")
    out = df.select(
        cells.rewrite_values(F.col("c"), lambda v: v.cast("long")).alias("c"))
    got = [(c.ts, c.value) for c in out.first().c]
    assert got == [(20, 7), (10, 3)]
    assert dict(out.dtypes)["c"] == "array<struct<ts:bigint,value:bigint>>"


def test_cells_from_events_orders_desc(spark):
    ev = spark.createDataFrame(
        [(1, 10, "x"), (1, 30, "z"), (1, 20, "y")], "id int, ts long, v string")
    out = ev.groupBy("id").agg(
        cells.cells_from_events(F.col("ts"), F.col("v")).alias("c"))
    assert [c.value for c in out.first().c] == ["z", "y", "x"]
