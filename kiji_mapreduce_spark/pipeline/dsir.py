"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS, public): pick raw-corpus documents that look like a TARGET
corpus by importance-weighting hashed n-gram bag-of-words models.

The published recipe, re-expressed in Spark's execution model:

1. Featurize both corpora as hashed n-gram counts (unigrams + bigrams
   into ``dim`` buckets — feature hashing, the ``classifier`` module's
   no-vocab-table trick).
2. Fit two smoothed categorical bucket distributions: ``p`` on the
   target sample, ``q`` on the raw corpus. Each fit is ONE dim-bounded
   partial aggregation; the resulting dim-row tables collect to the
   driver (dim doubles — the ``classifier.train_logreg`` weight-vector
   precedent, bounded regardless of corpus size).
3. Per raw document, the log importance weight is
   ``sum_b counts_b * (log p_b - log q_b)`` — the exploded gram table
   broadcast-joins the dim-row log-ratio table and aggregates per doc:
   ONE id-keyed (unique-key, unskewable) shuffle.
4. Resample without replacement with probability proportional to the
   importance weight w = exp(log_w). The paper uses Gumbel top-k; the
   Efraimidis–Spirakis exponential clocks already in
   ``sample.weighted_sample_topk`` draw the SAME distribution
   (both are w-proportional sampling without replacement), with this
   engine's deterministic md5 uniforms — the same corpus + seed
   selects the same rows on any cluster, partitioning, or engine.
   Because E-S order is invariant under scaling every weight by a
   constant, weights enter as ``exp(log_w - max(log_w))`` — exact and
   overflow-safe however extreme the log weights.

Scale shape at 100 TB: the target sample is small by definition (a
quality corpus like Wikipedia), the raw corpus is the 100 TB side —
it is read ONCE to featurize; everything after operates on the
exploded gram table (id-keyed aggregates) and dim-row broadcasts.
No driver state beyond 2 x dim doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from kiji_mapreduce_spark.functions import local_table
from kiji_mapreduce_spark.pipeline.dedup import token_hash64, tokens
from kiji_mapreduce_spark.pipeline.sample import weighted_sample_topk


def hashed_ngram_counts(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", dim: int = 10_000,
                        ns: tuple[int, ...] = (1, 2),
                        hash_fn: str = "xx") -> DataFrame:
    """Hashed n-gram bag counts: (id, bucket, cnt), one row per
    distinct bucket per doc. The paper's features are unigrams +
    bigrams hashed into 10k buckets; ``ns`` picks the gram orders.
    Built entirely on the codegen path: tokens posexplode once, the
    higher-order n-grams come from ``lead()`` over (id, pos) — ONE
    window pass computes every lead offset — and each row emits its
    per-n grams through one array explode. The original per-row
    ``transform``+``slice`` array lambdas ran interpreted and were
    4-5x slower end-to-end (measured at sf0.1: 3.98 s -> 0.87 s for
    the featurize); the window's id-keyed shuffle feeds the same
    id-keyed aggregation the job needs anyway. Repetition KEPT —
    these are counts, not set shingles. Empty/NULL docs produce no
    rows."""
    from pyspark.sql import Window

    if dim < 2:
        raise ValueError("dim must be >= 2")
    if any(n < 1 for n in ns):
        raise ValueError("n-gram orders must be >= 1")
    toks = tokens(F.col(text_col))
    # the window partitions on a per-ROW key, not id_col: with
    # duplicate ids (a caller not guaranteeing uniqueness) id-keyed
    # lead() would pair tokens ACROSS rows in tie-order that varies
    # with partitioning — grams must stay row-local the way the old
    # per-row array construction kept them (r13 review finding). The
    # key is opaque (monotonically_increasing_id varies with
    # partitioning) but only delimits rows; the output re-aggregates
    # on id_col, so results stay partitioning-independent.
    ex = (df.withColumn("_rid", F.monotonically_increasing_id())
          .select(F.col(id_col), "_rid",
                  F.posexplode(toks).alias("_pos", "_tok")))
    max_n = max(ns)
    if max_n > 1:
        w = Window.partitionBy("_rid").orderBy("_pos")
        ex = ex.select(
            id_col, "_tok",
            *[F.lead("_tok", i).over(w).alias(f"_l{i}")
              for i in range(1, max_n)])
    gram_cols = []
    for n in sorted(ns):
        if n == 1:
            gram_cols.append(F.col("_tok"))
        else:
            parts = [F.col("_tok")] + [F.col(f"_l{i}")
                                       for i in range(1, n)]
            # the LAST lead being non-null implies every earlier one
            # is (window order); concat_ws would silently skip a null
            # middle otherwise
            gram_cols.append(
                F.when(F.col(f"_l{n - 1}").isNotNull(),
                       F.concat_ws(" ", *parts)))
    exploded = (ex.select(F.col(id_col),
                          F.explode(F.array(*gram_cols)).alias("_gram"))
                .filter(F.col("_gram").isNotNull()))
    return (exploded
            .groupBy(id_col,
                     F.pmod(token_hash64(F.col("_gram"), hash_fn),
                            F.lit(dim)).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def _log_probs_from_totals(totals: list[float], dim: int,
                           smoothing: float) -> list[float]:
    """Laplace-smoothed log bucket probabilities from driver-side
    bucket totals — THE single copy of the model arithmetic: both
    ``bucket_log_probs`` (the standalone two-job form) and
    ``dsir_log_weights``' fused one-job fit call this, so the
    smoothing/rounding can never drift between them (r13 review
    finding). Rounded to 12 decimal places so the fitted model is
    reproducible across partitionings and engines."""
    denom = sum(totals) + smoothing * dim
    return [round(math.log((t + smoothing) / denom), 12)
            for t in totals]


def bucket_log_probs(counts: DataFrame, dim: int,
                     smoothing: float = 1.0) -> list[float]:
    """Laplace-smoothed log bucket probabilities from a
    ``hashed_ngram_counts`` table, as a dim-long driver-side list.
    ONE dim-bounded partial aggregation; the collect is dim rows
    (the classifier weight-vector precedent). ``dsir_log_weights``
    fits its two models in one fused job instead of calling this
    twice, but the arithmetic is shared — this is the standalone
    form for fitting/inspecting a single corpus model."""
    rows = (counts.groupBy("bucket").agg(F.sum("cnt").alias("n"))
            .collect())
    totals = [0.0] * dim
    for r in rows:
        totals[int(r["bucket"])] = float(r["n"])
    return _log_probs_from_totals(totals, dim, smoothing)


def dsir_log_weights(raw: DataFrame, target: DataFrame | None = None,
                     text_col: str = "text", id_col: str = "doc_id",
                     dim: int = 10_000, ns: tuple[int, ...] = (1, 2),
                     smoothing: float = 1.0,
                     hash_fn: str = "xx",
                     target_pred=None) -> DataFrame:
    """Per-raw-document DSIR log importance weights: (id, log_w) with
    ``log_w = sum_b counts_b * (log p_b - log q_b)`` for target model
    p and raw model q. The raw corpus text is read once (the
    featurize pass feeds both the q fit and the scoring); the
    log-ratio table is dim rows, joined broadcast.

    ``target_pred`` (a Column predicate over ``id_col``, mutually
    exclusive with ``target``) declares the target corpus as a
    FILTERED SUBSET of ``raw``: the p-side counts are then derived by
    filtering the already-checkpointed raw featurize instead of
    tokenizing the target documents a second time — featurization is
    per-document, so ``featurize(raw.filter(pred)) ==
    featurize(raw).filter(pred)`` exactly, and one whole corpus scan
    disappears (guide §2.4 "remove shuffles/passes outright"; measured
    at sf0.1: the target pass was a second 19 MB text scan +
    tokenize + window per execution). The predicate may reference
    ``id_col`` ONLY — any text-derived column would not survive into
    the count table."""
    if (target is None) == (target_pred is None):
        raise ValueError(
            "pass exactly one of target / target_pred")
    spark = raw.sparkSession
    raw_counts = hashed_ngram_counts(raw, text_col, id_col, dim, ns,
                                     hash_fn)
    # the exploded gram table is a diamond (q fit + scoring, and the
    # p fit too under target_pred) — pin it once rather than
    # re-tokenizing the 100 TB side per consumer
    raw_counts = raw_counts.localCheckpoint(eager=True)
    if target_pred is not None:
        tgt_counts = raw_counts.filter(target_pred)
    else:
        tgt_counts = hashed_ngram_counts(target, text_col, id_col,
                                         dim, ns, hash_fn)
    # BOTH model fits in ONE Spark job: union the side-tagged count
    # tables and aggregate (side, bucket) together — same dim-bounded
    # collect and identical arithmetic as two bucket_log_probs calls,
    # one driver round trip instead of two (this was the suite's most
    # expensive query, and the cost was job barriers, not data)
    tagged = (raw_counts.select(F.lit("q").alias("_side"), "bucket",
                                "cnt")
              .unionByName(tgt_counts.select(
                  F.lit("p").alias("_side"), "bucket", "cnt")))
    rows = (tagged.groupBy("_side", "bucket")
            .agg(F.sum("cnt").alias("n")).collect())
    totals = {"p": [0.0] * dim, "q": [0.0] * dim}
    for r in rows:
        totals[r["_side"]][int(r["bucket"])] = float(r["n"])

    log_p = _log_probs_from_totals(totals["p"], dim, smoothing)
    log_q = _log_probs_from_totals(totals["q"], dim, smoothing)
    # Arrow-local model table: the classic list createDataFrame ships
    # a pickled RDD whose Python-worker replay cost dominated this
    # query's scoring job (functions.local_table)
    ratio = local_table(
        spark, [(b, log_p[b] - log_q[b]) for b in range(dim)],
        "bucket int, log_ratio double")
    return (raw_counts
            .join(F.broadcast(ratio), on="bucket", how="inner")
            .groupBy(id_col)
            .agg(F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 9)
                 .alias("log_w")))


def dsir_resample(raw: DataFrame, target: DataFrame, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  dim: int = 10_000, ns: tuple[int, ...] = (1, 2),
                  smoothing: float = 1.0, seed: int = 42,
                  hash_fn: str = "xx") -> DataFrame:
    """Select ``k`` raw documents by DSIR importance resampling:
    weight-proportional sampling WITHOUT replacement where weight =
    exp(log importance weight). Returns the selected raw rows with
    their ``log_w`` and selection ``rank``.

    The clocks run on ``exp(log_w - max(log_w))`` — Efraimidis–
    Spirakis order is invariant under a constant weight scale, so the
    max-shift changes nothing about WHICH rows win while keeping the
    exponential finite for arbitrarily extreme log weights (the max
    is one scalar aggregate). Weights are floored at 1e-300 so a doc
    more than ~745 nats below the best stays PICKABLE (the sampler
    excludes zero weights; without the floor, k close to n could
    return fewer than k rows) — among floored docs relative order is
    lost, which only matters ~e^-745 of the time. Empty/whitespace-only
    docs produce no n-gram rows and hence no log weight; they stay in
    the candidate pool via a LEFT join with their weight floored at
    the minimum observed log weight (least-target-like, but pickable —
    without this the resample could return fewer than k rows even when
    the raw corpus holds >= k documents; ADVICE r12). Deterministic:
    same corpora + seed + dim select the same rows on any
    partitioning or engine."""
    logw = dsir_log_weights(raw, target, text_col, id_col, dim, ns,
                            smoothing, hash_fn)
    # two consumers (the min/max scalars, the clock run) — pin the
    # small (id, log_w) table once
    logw = logw.localCheckpoint(eager=True)
    stats = logw.agg(F.min("log_w").alias("mn"),
                     F.max("log_w").alias("mx")).collect()[0]
    # no doc produced any gram (every text empty/NULL): weights are
    # uniform and the resample degrades to a deterministic uniform
    # draw of k, rather than silently returning zero rows
    mn = float(stats["mn"]) if stats["mn"] is not None else 0.0
    mx = float(stats["mx"]) if stats["mx"] is not None else 0.0
    scored = (raw.join(logw, on=id_col, how="left")
              .withColumn("log_w",
                          F.coalesce(F.col("log_w"), F.lit(mn)))
              .withColumn("_w", F.greatest(
                  F.exp(F.col("log_w") - F.lit(mx)),
                  F.lit(1e-300))))
    picked = weighted_sample_topk(
        scored.withColumn("_stratum", F.lit(1)),
        strata_col="_stratum", weight_col="_w", k=k,
        key_col=id_col, seed=seed)
    return picked.drop("_stratum", "_w")
