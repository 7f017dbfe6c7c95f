"""Linear quality classifier trained IN the engine.

The CCNet/fastText-style corpus-filtering recipe (Wenzek et al. 2020,
public): score every document with a cheap linear model over hashed
bag-of-words features and keep the high-probability slice. Training such
a filter is itself a distributed job; this module runs batch-gradient
logistic regression as a sequence of narrow Spark passes.

Scale shape (the design constraint at 100 TB):

- ``hashed_features`` is the only corpus-text pass: tokens hash into
  ``dim`` buckets (feature hashing, Weinberger et al. 2009 — no vocab
  table to build or ship) and the output is the exploded sparse matrix
  (doc, feature_idx, value), L1-normalized per doc.
- Each training round is: broadcast the dim-row weight table into the
  feature matrix (no shuffle of the matrix), aggregate margins per doc,
  and aggregate per-feature gradient partials — the ONLY per-round
  shuffle volume is O(distinct feature ids) = dim rows. The feature
  matrix is localCheckpoint'd once and reused by every round.
- The weight vector lives on the driver (dim doubles); per-round
  gradient rounding (9 dp) makes the trained model reproducible across
  partitionings despite float summation order.
- ``score_logreg`` prices new documents with the trained weights via
  the same broadcast join — no Python in the loop at all.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from kiji_mapreduce_spark.functions import local_table
from kiji_mapreduce_spark.pipeline.dedup import tokens


def hashed_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    dim: int = 1024, hash_fn: str = "xx",
) -> DataFrame:
    """Hashed bag-of-words -> (id, feature_idx, value), one row per
    distinct token per doc, value = token count / doc token count
    (L1 tf). Empty/NULL docs produce no rows (they score through the
    bias alone). ``hash_fn`` follows ``dedup.token_hash64``: "xx"
    (xxhash64, the production path) or "md5" (reproducible in DuckDB —
    what makes the scoring suite query oracle-checkable)."""
    from kiji_mapreduce_spark.pipeline.dedup import token_hash64

    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = (df.select(F.col(id_col), F.explode(tokens(F.col(text_col)))
                      .alias("_tok")))
    per = (toks.groupBy(id_col,
                        F.pmod(token_hash64(F.col("_tok"), hash_fn),
                               F.lit(dim))
                        .alias("feature_idx"))
           .agg(F.count(F.lit(1)).alias("_cnt")))
    tot = F.sum("_cnt").over(Window.partitionBy(id_col))
    return per.select(
        id_col, "feature_idx",
        (F.col("_cnt") / tot).alias("value"))


def train_logreg(
    features: DataFrame, labels: DataFrame, dim: int,
    id_col: str = "doc_id", label_col: str = "label",
    iters: int = 20, lr: float = 2.0, l2: float = 0.0,
) -> tuple[np.ndarray, float]:
    """Batch-GD logistic regression over an exploded sparse feature
    matrix -> (weights[dim], bias).

    ``labels`` holds (id, label in {0,1}); docs without a label row are
    ignored. The label joins into the matrix ONCE up front; afterwards
    each round touches the checkpointed matrix with a broadcast
    weight-table join, so no corpus-sized shuffle ever repeats."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = features.sparkSession
    lab = labels.select(F.col(id_col),
                        F.col(label_col).cast("double").alias("_y"))
    # synthetic bias feature (idx -1, value 1, weight always 0 in the
    # broadcast table): its gradient row IS sum(residual), so one
    # aggregate per round yields both the weight gradient and the bias
    # gradient — a separate resid.agg() action re-executed the whole
    # margin lineage every round (review finding). It also enrolls
    # labeled EMPTY documents, which the feature join alone dropped.
    bias_rows = lab.select(
        id_col, F.lit(-1).alias("feature_idx"),
        F.lit(1.0).alias("value"), "_y")
    mat = (features.join(lab, on=id_col)
           .select(id_col, "feature_idx", "value", "_y")
           .unionByName(bias_rows)
           .localCheckpoint())
    n_docs = lab.count()
    if n_docs == 0:
        raise ValueError("train_logreg: no labeled documents")

    w = np.zeros(dim)
    bias = 0.0
    for _ in range(iters):
        wt = local_table(
            spark,
            [(int(i), float(v)) for i, v in enumerate(w) if v != 0.0]
            or [(0, 0.0)],
            "feature_idx int, _w double")
        scored = (mat.join(F.broadcast(wt), on="feature_idx", how="left")
                  .groupBy(id_col)
                  .agg((F.sum(F.col("value")
                              * F.coalesce(F.col("_w"), F.lit(0.0)))
                        + F.lit(bias)).alias("_m"),
                       F.first("_y").alias("_y")))
        resid = scored.select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m")))
             - F.col("_y")).alias("_r"))
        grad_rows = (mat.join(resid, on=id_col)
                     .groupBy("feature_idx")
                     .agg(F.sum(F.col("value") * F.col("_r"))
                          .alias("_g"))
                     .collect())
        grad = np.zeros(dim)
        gsum = 0.0
        for r in grad_rows:
            if r.feature_idx == -1:
                gsum = r._g  # bias partial rides the same aggregate
            else:
                grad[r.feature_idx] = r._g
        grad = grad / n_docs + l2 * w
        gbias = gsum / n_docs
        # fixed-precision rounding per round: summation order must not
        # leak into the model (same discipline as pagerank/kmeans)
        w = np.round(w - lr * grad, 9)
        bias = round(bias - lr * gbias, 9)
    return w, bias


def score_logreg(
    features: DataFrame, weights: np.ndarray, bias: float,
    id_col: str = "doc_id", round_digits: int = 6,
) -> DataFrame:
    """Probability per doc under a trained model -> (id, prob). One
    broadcast join + one per-doc aggregate; docs absent from the matrix
    (empty text) are absent here too — union them in at sigmoid(bias)
    if needed. Probabilities are rounded to ``round_digits`` — filtering
    never needs more, and the rounding is what keeps a downstream
    ``binary_metrics`` distinct-score table bounded at 10^digits rows
    (its documented precondition)."""
    spark = features.sparkSession
    wt = local_table(
        spark,
        [(int(i), float(v)) for i, v in enumerate(weights) if v != 0.0]
        or [(0, 0.0)],
        "feature_idx int, _w double")
    return (features.join(F.broadcast(wt), on="feature_idx", how="left")
            .groupBy(id_col)
            .agg(F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(
                    -(F.sum(F.col("value")
                            * F.coalesce(F.col("_w"), F.lit(0.0)))
                      + F.lit(bias)))),
                round_digits).alias("prob")))


def binary_metrics(
    scored: DataFrame, labels: DataFrame, id_col: str = "doc_id",
    score_col: str = "prob", label_col: str = "label",
    threshold: float = 0.5,
) -> DataFrame:
    """Distributed evaluation of a binary scorer -> one row:
    (n, n_pos, auc, accuracy, precision, recall).

    AUC by the pairwise identity P(s_pos > s_neg) + 0.5 P(s_pos = s_neg),
    computed from per-DISTINCT-SCORE counts: the corpus-sized work is one
    partial-aggregated groupBy(score); the cumulative pass then runs over
    the distinct-score table only. That bound is what makes this safe at
    scale — a naive global rank() window funnels every row into one task,
    while scores rounded to d decimals cap this window at 10^d rows
    regardless of corpus size. Round scores upstream accordingly.
    """
    # NULL hygiene: a NULL label (e.g. a failed cast) must not count as
    # a confirmed negative, and a NULL score must not rank below every
    # real score — silently skewing each metric (review finding; same
    # class as the kmv_distinct NULL-slot bug). Rows missing either
    # side are excluded from n.
    j = (scored.select(id_col, score_col)
         .filter(F.col(score_col).isNotNull())
         .join(labels.select(F.col(id_col),
                             F.col(label_col).try_cast("int").alias("_y"))
               .filter(F.col("_y").isNotNull()),
               on=id_col))
    g = (j.groupBy(F.col(score_col).alias("_s"))
         .agg(F.count(F.lit(1)).alias("_n"),
              F.sum("_y").alias("_pos")))
    w = (Window.orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    per = g.select(
        "_s", "_n", "_pos", (F.col("_n") - F.col("_pos")).alias("_neg"),
        F.coalesce(F.sum(F.col("_n") - F.col("_pos")).over(w), F.lit(0))
        .alias("_neg_below"))
    agg = per.agg(
        F.sum("_n").alias("n"),
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_pos")
              * (F.col("_neg_below") + 0.5 * F.col("_neg")))
        .alias("_wins"),
        F.sum(F.when(F.col("_s") >= threshold, F.col("_pos"))
              .otherwise(F.col("_neg"))).alias("_correct"),
        F.sum(F.when(F.col("_s") >= threshold, F.col("_pos"))
              .otherwise(0)).alias("_tp"),
        F.sum(F.when(F.col("_s") >= threshold, F.col("_n"))
              .otherwise(0)).alias("_pred_pos"))
    n_neg = F.col("n") - F.col("n_pos")
    # double math: n_pos * n_neg overflows int64 around 8B balanced
    # rows (ANSI aborts, non-ANSI wraps negative) — review finding
    auc = F.when((F.col("n_pos") > 0) & (n_neg > 0),
                 F.col("_wins").cast("double")
                 / (F.col("n_pos").cast("double")
                    * n_neg.cast("double")))
    return agg.select(
        "n", "n_pos",
        F.round(auc, 6).alias("auc"),
        F.round(F.col("_correct") / F.col("n"), 6).alias("accuracy"),
        F.round(F.when(F.col("_pred_pos") > 0,
                       F.col("_tp") / F.col("_pred_pos")), 6)
        .alias("precision"),
        F.round(F.when(F.col("n_pos") > 0,
                       F.col("_tp") / F.col("n_pos")), 6).alias("recall"))
