"""asof_join / range_join_binned semantics."""

from pyspark.sql import functions as F

from kiji_mapreduce_spark.functions import asof_join, range_join_binned


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 25, "p2"), (2, 5, "p3")],
        "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 500.0)],
        "k long, t long, v double")
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="t", value_cols=["v"])
    got = {r.name: r.v for r in out.collect()}
    assert got == {"p1": 100.0,  # equal ts matches (inclusive)
                   "p2": 200.0,  # latest earlier
                   "p3": None}   # nothing at-or-before


def test_asof_strict(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="t", value_cols=["v"],
                    strict=True)
    got = {r.name: r.v for r in out.collect()}
    assert got == {"p1": None, "p2": 200.0, "p3": None}


def test_asof_ties_pick_max_value(spark):
    left = spark.createDataFrame([(1, 10, "p")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 9.0)], "k long, t long, v double")
    out = asof_join(left, right, on="k", left_ts="t", value_cols=["v"])
    assert out.first().v == 9.0  # deterministic tie-break


def test_asof_match_is_one_row_not_per_column(spark):
    """ASOF semantics: all value columns come from the single matched
    right row — a NULL in one column of the newest right row must not be
    backfilled from an older row, and a newer all-but-one-NULL row must
    override an older complete one."""
    left = spark.createDataFrame([(1, 30, "p")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1.0, "old"), (1, 20, None, "new")],
        "k long, t long, v double, s string")
    out = asof_join(left, right, on="k", left_ts="t",
                    value_cols=["v", "s"]).first()
    assert out.s == "new"
    assert out.v is None  # the matched row's v IS null; no column mixing


def test_asof_preserves_left_count(spark):
    left, right = _sides(spark)
    assert asof_join(left, right, on="k", left_ts="t").count() == left.count()


def test_range_join_binned_matches_predicate(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100, 7)], "id long, x double")
    ranges = spark.createDataFrame(
        [("lo", 0.0, 30.0), ("mid", 30.0, 60.0), ("hi", 60.0, 95.0)],
        "band string, lo double, hi double")
    out = range_join_binned(points, ranges, "x", "lo", "hi", bin_width=10)
    got = {(r.id, r.band) for r in out.collect()}
    expect = {(i, b) for i in range(0, 100, 7)
              for b, lo, hi in [("lo", 0, 30), ("mid", 30, 60), ("hi", 60, 95)]
              if lo <= i < hi}
    assert got == expect
