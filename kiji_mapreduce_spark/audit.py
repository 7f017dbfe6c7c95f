"""Data-quality auditing: column profiles and referential checks.

The validation pass a pipeline runs before promoting a snapshot — the
engine-side analogue of the reference's job counters for rejected /
incomplete records (``JobHistoryCounters.java:35``), lifted from
per-job bookkeeping to declarative table-level expectations.

Scale shape: each profiled table is scanned ONCE (all metrics fold into
a single multi-aggregate; ``count_distinct`` goes through Catalyst's
expand, still one pass), and every check emits a uniform
``(check_name, subject, value)`` row so audits of many tables union
into one tiny result that can gate a promotion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(df: DataFrame, table_name: str,
                   cols: list[str]) -> DataFrame:
    """One-pass profile: row count plus per-column null count, exact
    distinct count, and min/max (cast to double so heterogeneous
    metrics stack into one numeric column)."""
    aggs = [F.count(F.lit(1)).cast("double").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("double")
            .alias(f"nn__{c}"),
            F.count_distinct(F.col(c)).cast("double").alias(f"nd__{c}"),
            F.min(F.col(c).cast("double")).alias(f"mn__{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx__{c}"),
        ]
    row = df.agg(*aggs)
    items = [f"'n_rows', '{table_name}', n_rows"]
    for c in cols:
        subj = f"{table_name}.{c}"
        items += [f"'n_nulls', '{subj}', nn__{c}",
                  f"'n_distinct', '{subj}', nd__{c}",
                  f"'min', '{subj}', mn__{c}",
                  f"'max', '{subj}', mx__{c}"]
    return row.selectExpr(
        f"stack({len(items)}, {', '.join(items)}) "
        "as (check_name, subject, value)")


def fk_orphans(child: DataFrame, parent: DataFrame,
               fk: str, pk: str, subject: str) -> DataFrame:
    """Referential-integrity check: count child rows whose foreign key
    has no matching parent row (left anti join — broadcast when the
    parent is a dim, shuffle otherwise; Catalyst decides)."""
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti")
    return orphans.agg(
        F.lit("fk_orphans").alias("check_name"),
        F.lit(subject).alias("subject"),
        F.count(F.lit(1)).cast("double").alias("value"))


def audit_union(checks: list[DataFrame]) -> DataFrame:
    """Union any number of check results into one audit report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
