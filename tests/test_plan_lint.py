"""Tests for the plan linter's unpartitioned-WindowExec rule (r7 verdict
ask #3): the parser must distinguish a *partitioned-but-unordered*
window (two bracket groups, second is a partition spec) from an
*unpartitioned-but-ordered* one (two groups, second is an order spec),
and the seeded-regression case — ranking unbounded input in a global
window, the exact shape `collocations_top` had before the r8 fix — must
trip the rule."""

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from tools.plan_lint import _unpartitioned_windows  # noqa: E402

# Real toString() forms captured from Spark 4.1 physical plans.
PARTITIONED_NO_ORDER = (
    "+- Window [max(pos#7) windowspecdefinition(doc_id#0L, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "unboundedfollowing$())) AS _max_pos#11], [doc_id#0L]"
)
UNPARTITIONED_ORDERED = (
    "+- Window [row_number() windowspecdefinition(_clock#100 ASC NULLS "
    "FIRST, word#93 ASC NULLS FIRST, specifiedwindowframe(RowFrame, "
    "unboundedpreceding$(), currentrow$())) AS rank#104], "
    "[_clock#100 ASC NULLS FIRST, word#93 ASC NULLS FIRST]"
)
PARTITIONED_AND_ORDERED = (
    "+- Window [row_number() windowspecdefinition((x#1L % 2), x#1L ASC "
    "NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "currentrow$())) AS r#5], [(x#1L % 2)], [x#1L ASC NULLS FIRST]"
)


def test_parser_partitioned_unordered_not_flagged():
    assert _unpartitioned_windows(PARTITIONED_NO_ORDER) == 0


def test_parser_unpartitioned_ordered_flagged():
    assert _unpartitioned_windows(UNPARTITIONED_ORDERED) == 1


def test_parser_partitioned_ordered_not_flagged():
    assert _unpartitioned_windows(PARTITIONED_AND_ORDERED) == 0


def test_parser_counts_across_tree():
    plan = "\n".join([PARTITIONED_NO_ORDER, UNPARTITIONED_ORDERED,
                      PARTITIONED_AND_ORDERED, UNPARTITIONED_ORDERED])
    assert _unpartitioned_windows(plan) == 2


def test_seeded_regression_global_rank_trips(spark):
    """Ranking a non-limited table in an unpartitioned window — the
    pre-r8 collocations_top shape — must be detected in a live plan."""
    df = spark.range(100).toDF("x")
    bad = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("x")))
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert _unpartitioned_windows(plan) >= 1


def test_partitioned_live_plan_clean(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("x"))
    ok = df.withColumn(
        "rank", F.row_number().over(Window.partitionBy("g").orderBy("x")))
    plan = ok._jdf.queryExecution().executedPlan().toString()
    assert _unpartitioned_windows(plan) == 0


def test_collocations_top_uses_take_ordered(spark, sf_dir):
    """The r8 fix: the top-20 selection must be TakeOrderedAndProject
    (orderBy+limit), with the rank window fed only the 20 survivors —
    never a global row_number over the full pruned pair table."""
    from kiji_mapreduce_spark import suite

    df = suite.QUERIES["collocations_top"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_parser_unbalanced_bracket_is_skipped_not_crash():
    """A window line whose brackets never rebalance (e.g. a '[' inside
    a string literal) is skipped instead of feeding an int start index
    to re.search (r13 review finding)."""
    bad = ("+- Window [contains(x#1, [) AS y#2], [x#1 ASC NULLS FIRST")
    assert _unpartitioned_windows(bad) == 0


def test_top_field_count_ignores_nested_type_commas():
    """decimal(p,s)/map<k,v>/nested-struct commas are type punctuation,
    not field separators; and the check needs the UNTRUNCATED schema
    (maxMetadataStringLength raised in main) to see wide scans at all."""
    from tools.plan_lint import _n_top_fields

    assert _n_top_fields("a:bigint,b:string") == 2
    assert _n_top_fields("a:decimal(12,2),b:map<string,bigint>") == 2
    assert _n_top_fields(
        "a:struct<x:int,y:array<struct<p:int,q:int>>>,b:int,c:int") == 3
