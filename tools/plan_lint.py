"""Plan linter: walk every suite query's physical plan and flag shapes
that won't survive 100 TB.

Checks (per query):
- CartesianProduct anywhere -> ERROR (unbounded blow-up)
- BroadcastNestedLoopJoin -> WARN unless the query is on an allowlist
  (intentional tiny-broadcast patterns like KNN query sets)
- parquet scans that read every column of a wide table -> WARN
  (projection should prune; wide = >8 columns read from lineitem/orders)
- row-at-a-time PythonUDF (non-Arrow) in the plan -> ERROR
  (only ArrowEvalPython / mapInPandas allowed)
- WindowExec with an empty partition spec -> ERROR unless the query is
  on UNPARTITIONED_WINDOW_ALLOWED (window input literally bounded: a
  post-limit rank, a <=bins histogram, a k-row seed table)

Usage: python tools/plan_lint.py [sf_dir]
Exit 1 on any ERROR.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# queries where a nested-loop over a tiny broadcast side is the intended
# plan (query sets of ~5 rows; IVF probes cross tiny centroid tables;
# tfidf/bm25/lm cross single-row broadcast scalar aggregates — corpus
# size, avg doc length, vocabulary size)
BNLJ_ALLOWED = {"knn_cosine_topk", "knn_ivf_topk", "knn_pq_topk",
                "knn_sq8_topk",
                # recall eval embeds the IVF + brute searches, so it
                # inherits their tiny-broadcast query-set joins
                "knn_recall_ivf",
                # the unigram/pair TOTALS are 1-row broadcast scalars
                "collocations_top",
                "tfidf_top_terms", "bm25_search_topk", "lm_bigram_quality",
                # 5 broadcast anchors x corpus with a non-equi (label
                # mismatch) predicate — same intended shape as knn
                "hard_negative_mining",
                # embeds brute_force_topk's 5-row broadcast query set
                # (non-equi self-exclusion) — the knn_cosine shape
                "staged:hybrid_search_rrf"}
# queries whose whole point is reading most of a table
WIDE_SCAN_ALLOWED = {"producer_price_band", "window_top3_orders_per_customer",
                     "window_running_revenue", "quantiles_order_price",
                     "cube_order_stats"}
# queries where a WindowExec with NO partition spec is fine because its
# input subtree is literally bounded — a global rank over rows that a
# limit / histogram-bin cap / k-row seed table already reduced to a
# handful.  An unpartitioned window over unbounded input funnels the
# whole table through one task at 100x scale, so anything NOT listed
# here is an ERROR.
UNPARTITIONED_WINDOW_ALLOWED = {
    # rank applied AFTER orderBy(...).limit(k) — TakeOrdered feeds the
    # window <= k rows
    "classifier_score_topk", "collocations_top",
    # salted_topk's final phase: global rank over the <= n_salts * k
    # per-salt survivors (the constant "_all" stratum folds away,
    # leaving the bounded re-rank)
    "negative_sample_vocab",
    # 8-row deterministic-centroid seed rank after orderBy().limit(8)
    # (recall eval embeds the ivf search twice: probe + exact baseline)
    "knn_ivf_topk", "knn_recall_ivf",
    # global-frame share-of-total over the per-stratum grouped
    # aggregate — input bounded by distinct strata (languages/sources),
    # not corpus size (pipeline/sample.py mixture_weights)
    "mixture_temperature", "mixture_token_budget",
    # cumulative share over a <= n_bins histogram table (audit.py)
    "drift_orders_price",
}


def _unpartitioned_windows(plan: str) -> int:
    """Count WindowExec nodes whose partition spec is empty.

    A WindowExec prints as ``Window [exprs], [partSpec], [orderSpec]``
    with EMPTY argument sequences omitted entirely, so both an
    unpartitioned-but-ordered window and a partitioned-but-unordered
    one print two top-level bracket groups.  The discriminator: order
    specs always carry sort markers (``ASC NULLS`` / ``DESC NULLS``),
    partition specs never do.  Groups are split depth-aware because
    window expressions nest brackets (array indexing, lambdas).
    """
    count = 0
    for m in re.finditer(r"(?m)(?:^|[\s:+-])Window (\[.*)$", plan):
        rest = m.group(1)
        depth = 0
        groups = []
        for i, ch in enumerate(rest):
            if ch == "[":
                if depth == 0:
                    groups.append(i + 1)
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups[-1] = rest[groups[-1]:i]
        # an unbalanced bracket inside a string literal leaves the
        # start INDEX unreplaced — skip unparseable lines instead of
        # feeding an int to re.search (r13 review finding)
        groups = [g for g in groups if isinstance(g, str)]
        if len(groups) == 1:
            count += 1  # neither partitioned nor ordered: global frame
        elif len(groups) == 2 and re.search(
                r"(?:ASC|DESC) NULLS", groups[1]):
            count += 1  # second group is an ORDER spec -> no partition
    return count


def _n_top_fields(schema_body: str) -> int:
    """Top-level field count of a ``struct<...>`` body: commas inside
    nested generics/parens (map<k,v>, decimal(p,s), inner structs) are
    TYPE punctuation, not field separators — counting them flagged
    narrow scans as wide (r13 review finding)."""
    depth = 0
    n = 1
    for ch in schema_body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from kiji_mapreduce_spark.session import make_session
    from kiji_mapreduce_spark import suite

    spark = make_session(master="local[8]", shuffle_partitions=16,
                         extra_conf={
                             "spark.ui.enabled": "false",
                             # default 100-char metadata truncation cut
                             # ReadSchema mid-list, silently disabling
                             # the wide-scan check for every table
                             # wider than ~6 columns (r13 review
                             # finding, verified live)
                             "spark.sql.maxMetadataStringLength":
                                 "10000",
                         })
    errors, warnings = [], []
    # staged seat candidates lint alongside the registry: a staged
    # query must not grow a CartesianProduct or a Python UDF while it
    # waits for a window slot
    all_queries = {**suite.QUERIES,
                   **{f"staged:{n}": f for n, f in suite.STAGED.items()}}
    for name, fn in all_queries.items():
        if name == "streaming_windowed_counts":
            continue  # streaming plans are inspected via their own API
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            errors.append(f"{name}: failed to plan: {e}")
            continue
        if "CartesianProduct" in plan:
            errors.append(f"{name}: CartesianProduct in plan")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            warnings.append(f"{name}: BroadcastNestedLoopJoin (check the "
                            f"build side is genuinely tiny)")
        if re.search(r"\bBatchEvalPython\b", plan):
            errors.append(f"{name}: row-at-a-time Python UDF in plan")
        nw = _unpartitioned_windows(plan)
        if nw and name not in UNPARTITIONED_WINDOW_ALLOWED:
            errors.append(f"{name}: {nw} unpartitioned Window node(s) — "
                          f"all rows move to one task; bound the input "
                          f"(orderBy+limit then rank) or partition the "
                          f"window")
        for m in re.finditer(r"FileScan parquet[^\n]*ReadSchema: struct<([^\n]*)", plan):
            ncols = _n_top_fields(m.group(1))
            if ncols > 8 and name not in WIDE_SCAN_ALLOWED:
                warnings.append(f"{name}: scan reads {ncols} columns — "
                                f"is projection pruning working?")
    spark.stop()
    for w in warnings:
        print(f"WARN  {w}")
    for e in errors:
        print(f"ERROR {e}")
    print(f"\n{len(errors)} errors, {len(warnings)} warnings "
          f"across {len(all_queries) - 1} plans")
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
