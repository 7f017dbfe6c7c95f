"""Statistical language-model scoring for corpus quality filtering.

The CCNet-style signal: train a small n-gram model on a reference
corpus, score every candidate document by its per-token log-likelihood,
and filter or bucket on the resulting perplexity. Documents that score
far from the reference distribution are boilerplate, gibberish, or the
wrong language/register.

This implements the add-alpha-smoothed bigram case entirely with
Catalyst expressions:

- "training" is two aggregations over the reference corpus (bigram
  counts and their per-context sums) — no driver-side model object, the
  model IS a DataFrame, so a 100 TB reference trains with one shuffle
  on the bigram hash;
- scoring joins candidate bigrams to the model on a 64-bit hash
  (equi-join, no broadcast assumption: a web-scale bigram table is
  itself huge), then averages log-probabilities per document;
- the vocabulary size folds into the plan as a broadcast scalar.

Cross-engine determinism: token/bigram hashes use ``token_hash64``
("md5" mode reproduces in DuckDB), and the per-doc average is rounded
to 4 dp (sum-order noise is ~1e-13 relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kiji_mapreduce_spark.pipeline.dedup import token_hash64, tokens


def _token_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, _v): the posexploded token table — the ONE corpus
    tokenize both the bigram build and the vocabulary count derive
    from."""
    return df.select(F.col(id_col),
                     F.posexplode(tokens(F.col(text_col)))
                     .alias("pos", "_v"))


def _bigrams(df: DataFrame, text_col: str, id_col: str,
             hash_fn: str) -> DataFrame:
    """(id, _hv, _hvw) one row per bigram: the hash of the conditioning
    token and of the joined "v w" bigram. Window/lead form — codegen'd,
    like ``dedup.shingle_hashes`` (interpreted array lambdas measured
    ~4x slower at sf0.1)."""
    return _bigrams_from_tokens(_token_rows(df, text_col, id_col),
                                id_col, hash_fn)


def _bigrams_from_tokens(ex: DataFrame, id_col: str,
                         hash_fn: str) -> DataFrame:
    w = Window.partitionBy(id_col).orderBy("pos")
    nxt = F.lead("_v", 1).over(w)
    return (ex.select(
                F.col(id_col),
                token_hash64(F.col("_v"), hash_fn).alias("_hv"),
                token_hash64(F.concat_ws(" ", F.col("_v"), nxt), hash_fn)
                .alias("_hvw"),
                nxt.alias("_w"))
            .filter(F.col("_w").isNotNull())
            .drop("_w"))


def bigram_lm_scores(
    docs: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xx",
) -> DataFrame:
    """Score every document by an add-``alpha`` bigram LM trained on
    ``reference`` (default: the corpus itself — the self-scoring mode
    used for outlier filtering).

    ``P(w|v) = (c(vw) + alpha) / (c(v) + alpha * V)`` where ``c(v)`` is
    the bigram-context count (sum of ``c(vw)`` over ``w``) and ``V`` the
    reference vocabulary size, so unseen bigrams and unseen contexts
    both back off smoothly.

    Returns one row per document (total): ``(id, n_bigrams,
    avg_logprob, ppl)`` with ``avg_logprob = mean ln P`` rounded to
    4 dp and ``ppl = exp(-avg_logprob)``; documents with fewer than two
    tokens report ``(0, NULL, NULL)``.

    In self-scoring mode the candidate bigrams ARE the training
    bigrams, so the reference is materialized once (eager
    localCheckpoint, the ``dedup.minhash_dedup`` diamond discipline)
    instead of re-running the tokenize + window per branch. The ONE
    pinned table is per-TOKEN rows carrying (token, context hash,
    bigram hash — NULL on each document's final token): it feeds the
    model aggregate, the context table, the vocabulary count AND the
    candidate side, where r14 pinned two tables (token rows, then
    bigram rows derived from them) — one checkpoint job and one
    materialization instead of two for identical results (guide
    §2.4/§5; the vocabulary count stays an exact countDistinct over
    token STRINGS, not hashes).
    """
    self_scoring = reference is None
    ref = docs if self_scoring else reference
    # ONE tokenize pass over the reference: the pinned token table
    # feeds the bigram build, the vocabulary count (a second complete
    # corpus text scan before r13) and, when self-scoring, the
    # candidate side
    w = Window.partitionBy(id_col).orderBy("pos")
    nxt = F.lead("_v", 1).over(w)
    ref_tok = (_token_rows(ref, text_col, id_col)
               .select(F.col(id_col), F.col("_v"),
                       token_hash64(F.col("_v"), hash_fn).alias("_hv"),
                       F.when(nxt.isNotNull(),
                              token_hash64(
                                  F.concat_ws(" ", F.col("_v"), nxt),
                                  hash_fn)).alias("_hvw"))
               .localCheckpoint(eager=True))
    ref_bi = (ref_tok.filter(F.col("_hvw").isNotNull())
              .drop("_v"))
    model = ref_bi.groupBy("_hvw").agg(
        F.count(F.lit(1)).alias("_cbw"),
        # every vw row shares one v; carrying it through lets the
        # context table below build from the (small) model instead of
        # re-scanning the reference
        F.first("_hv").alias("_mhv"))
    context = model.groupBy("_mhv").agg(F.sum("_cbw").alias("_cv"))
    vocab = F.broadcast(
        ref_tok.agg(F.countDistinct("_v").cast("double").alias("_vsz")))
    cand = ref_bi if self_scoring else _bigrams(docs, text_col, id_col,
                                                hash_fn)
    logp = F.log(
        (F.coalesce(F.col("_cbw"), F.lit(0)) + alpha)
        / (F.coalesce(F.col("_cv"), F.lit(0)) + alpha * F.col("_vsz")))
    scored = (cand
              .join(model.select("_hvw", "_cbw"), on="_hvw", how="left")
              .join(context.withColumnRenamed("_mhv", "_hv"),
                    on="_hv", how="left")
              .crossJoin(vocab)
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.avg(logp).alias("_avg")))
    # total over the candidate id set (zero-bigram docs emit no rows
    # above but still deserve a verdict — same discipline as
    # decontaminate.ngram_overlap)
    ids = docs.select(F.col(id_col)).distinct()
    return (ids.join(scored, on=id_col, how="left")
            .select(id_col,
                    F.coalesce(F.col("n_bigrams"), F.lit(0))
                    .alias("n_bigrams"),
                    F.round(F.col("_avg"), 4).alias("avg_logprob"),
                    F.round(F.exp(-F.col("_avg")), 4).alias("ppl")))


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """PMI collocation mining (the word2phrase signal for phrase-aware
    tokenization): adjacent word pairs whose co-occurrence beats chance
    -> (w1, w2, n_pair, n_w1, n_w2, pmi, npmi).

    pmi  = ln(p(w1w2) / (p(w1) p(w2))) — pair probability from the
    adjacent-pair distribution, unigram probabilities from the token
    distribution (the standard estimator, Church & Hanks 1990);
    npmi = pmi / -ln(p(w1w2)) — normalized to [-1, 1] so thresholds
    transfer across corpus sizes (Bouma 2009). ``min_count`` drops rare
    pairs BEFORE the joins (PMI is notoriously noisy at low counts, and
    the filter shrinks the pair table by the Zipf tail).

    Scale shape: the corpus text is scanned TWICE (once into the
    unigram aggregate, once through the lead() window into the pair
    aggregate — the same codegen'd form as ``_bigrams``) and never
    again: both count tables are Heaps-law-bounded and eagerly
    materialized, so their reuses (two unigram joins + both totals,
    derived by summing the aggregates) cost no further token scans;
    totals fold in as 1-row broadcast scalars; min_count prunes the
    pair table before the joins.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    ex = docs.select(F.col(id_col),
                     F.posexplode(tokens(F.col(text_col)))
                     .alias("pos", "_v"))
    # materialize both aggregates once: uni feeds two join sides + the
    # unigram total, the unfiltered pair table feeds the pair total +
    # the min_count survivors — without the checkpoints each reuse
    # re-executes the corpus token scan (the simhash/minhash diamond)
    uni = ex.groupBy(F.col("_v").alias("_w")).agg(
        F.count(F.lit(1)).alias("_n_w")).localCheckpoint(eager=True)
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs_all = (ex.select(F.col("_v").alias("w1"),
                           F.lead("_v", 1).over(w).alias("w2"))
                 .filter(F.col("w2").isNotNull())
                 .groupBy("w1", "w2")
                 .agg(F.count(F.lit(1)).alias("n_pair"))
                 .localCheckpoint(eager=True))
    pairs = pairs_all.filter(F.col("n_pair") >= min_count)
    tot_uni = uni.agg(F.sum("_n_w").cast("double").alias("_tu"))
    tot_pair = pairs_all.agg(F.sum("n_pair").cast("double").alias("_tp"))
    j = (pairs
         .join(uni.withColumnRenamed("_w", "w1")
               .withColumnRenamed("_n_w", "n_w1"), on="w1")
         .join(uni.withColumnRenamed("_w", "w2")
               .withColumnRenamed("_n_w", "n_w2"), on="w2")
         .crossJoin(F.broadcast(tot_uni))
         .crossJoin(F.broadcast(tot_pair)))
    p_pair = F.col("n_pair") / F.col("_tp")
    pmi = F.log(p_pair / ((F.col("n_w1") / F.col("_tu"))
                          * (F.col("n_w2") / F.col("_tu"))))
    # p_pair == 1 (a degenerate corpus whose every adjacent pair is
    # this one bigram) makes -ln(p_pair) zero: under the engine's ANSI
    # default the division ABORTS the job. Bouma's limit for perfect
    # association is 1.0 (r13 review finding).
    npmi = F.when(p_pair < 1.0, pmi / -F.log(p_pair)).otherwise(
        F.lit(1.0))
    return j.select(
        "w1", "w2", "n_pair", "n_w1", "n_w2",
        pmi.alias("pmi"),
        npmi.alias("npmi"))
