"""Sampling, mixtures and sketches: weighted/stratified sampling, token
budgets, document packing, KMV and count-min sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from kiji_mapreduce_spark import cells
from kiji_mapreduce_spark.pipeline import dedup, sample, sketch, text as text_ops
from kiji_mapreduce_spark.suite.common import _t


def q_weighted_sample(spark, sf_dir):
    """Efraimidis–Spirakis weighted sampling without replacement
    (``sample.weighted_sample_topk``): 10 documents per language with
    inclusion probability proportional to token count, selected by
    deterministic exponential clocks. Oracle: the same -ln(u)/w ranking
    in DuckDB (u is the shared md5 unit hash, so both engines draw the
    SAME clocks)."""
    docs = _t(spark, sf_dir, "documents")
    docs = docs.withColumn(
        "n_tokens", text_ops.token_count(F.col("text")).cast("long"))
    out = sample.weighted_sample_topk(
        docs, strata_col="lang", weight_col="n_tokens", k=10,
        key_col="doc_id", seed=11)
    return out.select("lang", F.col("rank").cast("long").alias("rank"),
                      "doc_id", "n_tokens")


SQL_WEIGHTED_SAMPLE = r"""
WITH d AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         ('0x' || substr(md5('11|' || doc_id::VARCHAR), 1, 15))::BIGINT
           AS h
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         -ln((h + 1) / 1152921504606846976.0) / n_tokens AS clock
  FROM d WHERE n_tokens > 0),
r AS (
  SELECT lang, doc_id, n_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY clock, doc_id) AS rank
  FROM c)
SELECT lang, rank, doc_id, n_tokens FROM r WHERE rank <= 10
"""


def q_kmv_distinct_users(spark, sf_dir):
    """KMV distinct-count sketch (``sketch.kmv_distinct``): estimated
    distinct users per event type from the 64 minimum md5 hashes —
    deterministic, so the ORACLE RECOMPUTES THE SAME SKETCH in DuckDB
    (engine-specific HLLs could never hash-match)."""
    ev = _t(spark, sf_dir, "events")
    return sketch.kmv_distinct(ev, "event_type", "user_id", k=64)


SQL_KMV_DISTINCT = """
WITH e AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM e),
a AS (
  SELECT event_type, count(*) AS n_sketch, max(h) AS kth_hash
  FROM r WHERE rk <= 64 GROUP BY event_type)
SELECT event_type, n_sketch, kth_hash,
       round(CASE WHEN n_sketch < 64 THEN n_sketch * 1.0
                  ELSE 63 / (kth_hash / 1152921504606846976.0) END,
             2) AS estimate
FROM a
"""


def q_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters (``sketch.countmin_table`` +
    ``countmin_estimates``): a 4x512 CMS over document tokens, probed
    with the exact top-20 tokens so the output exposes estimate vs
    truth (estimate >= exact always; equality when no bucket
    collision). md5 hash mode makes the sketch a pure function DuckDB
    reproduces cell-for-cell — the ORACLE REBUILDS THE WHOLE SKETCH."""
    docs = _t(spark, sf_dir, "documents")
    # ONE corpus tokenization + count; the (vocab-sized) count table is
    # checkpointed and feeds both the sketch (as weights) and the exact
    # top-20 — the naive form scanned and shuffled the corpus twice
    counts = (docs.select(
        F.explode(dedup.tokens(F.col("text"))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint())
    cms = sketch.countmin_table(
        counts, "token", depth=4, width=512, hash_fn="md5",
        weight_col="exact_cnt")
    top = (counts.orderBy(F.col("exact_cnt").desc(), F.col("token"))
           .limit(20))
    est = sketch.countmin_estimates(
        cms, top, "token", depth=4, width=512, hash_fn="md5")
    return est.select("token", "exact_cnt", "cms_estimate")


SQL_COUNTMIN_HEAVY_HITTERS = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents),
counts AS (
  SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
rows_ AS (SELECT unnest(range(0, 4)) AS cm_row),
cells AS (
  SELECT cm_row,
         ('0x' || substr(md5(token || '|' || cm_row), 1, 15))::BIGINT
           % 512 AS cm_bucket,
         sum(cnt)::BIGINT AS cm_count
  FROM counts CROSS JOIN rows_ GROUP BY 1, 2),
top AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 20)
SELECT t.token, t.cnt AS exact_cnt, min(c.cm_count)::BIGINT AS cms_estimate
FROM top t CROSS JOIN rows_ r
JOIN cells c
  ON c.cm_row = r.cm_row
 AND c.cm_bucket = ('0x' || substr(md5(t.token || '|' || r.cm_row), 1, 15))
                     ::BIGINT % 512
GROUP BY 1, 2
"""


def q_mixture_temperature(spark, sf_dir):
    """Temperature-based mixture rebalancing (``sample.mixture_weights``
    with ``temperature=0.7``): per-source keep probabilities from
    ``share^(1/T)`` renormalized — the standard multilingual data
    balancing knob. Oracle: the same pow/window arithmetic in DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return sample.mixture_weights(docs, "source", temperature=0.7)


SQL_MIXTURE_TEMPERATURE = r"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
s AS (
  SELECT *, n_tokens * 1.0 / sum(n_tokens) OVER () AS share FROM per),
t AS (
  SELECT *,
         pow(share, 1.0 / 0.7) / sum(pow(share, 1.0 / 0.7)) OVER () AS tgt
  FROM s),
r AS (SELECT *, tgt / share AS raw FROM t)
SELECT source, n_docs, n_tokens, round(share, 4) AS token_share,
       round(raw / max(raw) OVER (), 4) AS sample_weight
FROM r
"""


def q_pack_documents(spark, sf_dir):
    """Sequence packing: deterministic hash order per (source, shard),
    cumulative token counts chunked into 512-token packs. 4 shards per
    source keep the windows parallel (a straggler-avoidance shape that
    matters at 100 TB, exercised here)."""
    docs = _t(spark, sf_dir, "documents")
    out = sample.pack_documents(
        docs, budget=512, n_shards=4, seed=42, hash_fn="md5")
    # bigint to match the oracle's window-sum type discipline
    return out.withColumn("n_tokens", F.col("n_tokens").cast("long"))


SQL_PACK_DOCUMENTS = r"""
WITH base AS (
  SELECT doc_id, source,
         -- NULL text packs as a zero-token doc (the r13
         -- pack_documents contract; bare len() is NULL for NULL text)
         coalesce(len(regexp_extract_all(text, '\S+')), 0) AS n_tokens,
         ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 10000 AS u,
         ('0x' || substr(md5('shard42|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 4 AS shard
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens, shard,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY u, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS before
  FROM base
)
SELECT doc_id, source, n_tokens, shard,
       floor(before / 512)::BIGINT AS pack_id,
       before % 512 AS pack_offset
FROM c
"""


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language Bernoulli sample by md5 key hash —
    membership is a pure function of (seed, doc_id), reproducible in any
    engine and under any partitioning. Filter-only: no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return sample.stratified_sample(
        docs, strata_col="lang", rates={"en": 0.5, "zh": 0.35},
        default_rate=0.2, seed=42, hash_fn="md5",
    ).select("doc_id", "lang", "source")


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang, source FROM documents
WHERE ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000
      < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 3500 ELSE 2000 END
"""


def q_sample_stratum_topk(spark, sf_dir):
    """Deterministic reservoir: exactly 3 docs per language — the 3
    smallest key hashes, stable under re-partitioning and re-runs."""
    docs = _t(spark, sf_dir, "documents")
    return sample.stratum_topk(
        docs, strata_col="lang", k=3, seed=42, hash_fn="md5",
    ).select("doc_id", "lang", "sample_rank")


SQL_SAMPLE_STRATUM_TOPK = """
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT
                    % 10000, doc_id) AS sample_rank
  FROM documents
) WHERE sample_rank <= 3
"""


def q_mixture_token_budget(spark, sf_dir):
    """Per-source token totals + the sampling weight that reshapes the
    corpus toward a uniform source mixture (largest weight pinned to 1):
    one grouped agg, windows over the tiny per-source result."""
    docs = _t(spark, sf_dir, "documents")
    return sample.mixture_weights(docs, group_col="source")


SQL_MIXTURE_TOKEN_BUDGET = r"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_docs, n_tokens,
         n_tokens / sum(n_tokens) OVER () AS share,
         (1.0 / count(*) OVER ()) / (n_tokens / sum(n_tokens) OVER ()) AS raw
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(share, 4) AS token_share,
       round(raw / max(raw) OVER (), 4) AS sample_weight
FROM s
"""


def q_split_train_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by md5 key hash
    (a pure function of doc_id — re-runs, appends, and engine changes
    keep every doc on the same side), summarized per (source, split).
    The assignment is a shuffle-free projection; only the summary
    aggregates."""
    from kiji_mapreduce_spark.pipeline.sample import split_assign
    docs = _t(spark, sf_dir, "documents")
    assigned = split_assign(docs, seed=42, hash_fn="md5")
    return (assigned.groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


SQL_SPLIT_TRAIN_TEST = """
WITH s AS (
  SELECT source, n_chars,
         CASE WHEN u < 8000 THEN 'train'
              WHEN u < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT source, n_chars,
               ('0x' || substr(md5('split|42|' || doc_id::VARCHAR), 1, 15))::BIGINT
                 % 10000 AS u
        FROM documents)
)
SELECT source, split, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM s GROUP BY source, split
"""


def q_split_leakage(spark, sf_dir):
    """Eval contamination audit under a NEAR-dup content key: held-out
    docs whose rolling-hash fingerprint (``text.fingerprints``) also
    appears in the train split — the corpus has no byte-exact
    duplicates, but fingerprints collide across near-identical docs, so
    the rate is non-trivially positive. Only 64-bit digests shuffle —
    the train side is a DISTINCT digest set, the held-out side
    equi-joins it."""
    from kiji_mapreduce_spark import audit
    from kiji_mapreduce_spark.pipeline.sample import split_assign
    docs = _t(spark, sf_dir, "documents")
    assigned = split_assign(docs, seed=42, hash_fn="md5")
    fp = text_ops.fingerprints(docs, hash_fn="md5")
    return audit.split_leakage(assigned.join(fp, on="doc_id"),
                               digest_col="fingerprint")


def _split_leakage_sql() -> str:
    from kiji_mapreduce_spark import oracles
    return f"""
WITH fp AS ({oracles.fingerprint_sql()}),
s AS (
  SELECT fp.fingerprint AS h,
         CASE WHEN u < 8000 THEN 'train'
              WHEN u < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM fp JOIN (
    SELECT doc_id,
           ('0x' || substr(md5('split|42|' || doc_id::VARCHAR), 1, 15))::BIGINT
             % 10000 AS u
    FROM documents) u USING (doc_id)
),
tr AS (SELECT DISTINCT h FROM s WHERE split = 'train')
SELECT split,
       count(*) AS n_docs,
       sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_leaked,
       round(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 4) AS leak_rate
FROM s LEFT JOIN tr USING (h)
WHERE split <> 'train'
GROUP BY split
"""


SQL_SPLIT_LEAKAGE = _split_leakage_sql()


def q_negative_sample_vocab(spark, sf_dir):
    """word2vec-style negative-sampling table (Mikolov et al. 2013):
    20 vocabulary words drawn WITHOUT replacement with probability
    proportional to count^0.75, via the same deterministic
    Efraimidis-Spirakis clocks as ``weighted_sample_topk``. The 3/4
    power is computed as sqrt(cnt)*sqrt(sqrt(cnt)) — sqrt is IEEE
    correctly-rounded in every engine, unlike libm pow, so the weights
    (and therefore the clock ranking) are bit-exact cross-engine. One
    token-count aggregate; the k-min selection is the skew-safe salted
    top-k over the Heaps-law-bounded vocab table."""
    docs = _t(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(dedup.tokens(F.col("text"))).alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    wc = (wc.withColumn("_all", F.lit("all"))
          .withColumn("w34", F.sqrt(F.col("cnt"))
                      * F.sqrt(F.sqrt(F.col("cnt")))))
    out = sample.weighted_sample_topk(
        wc, strata_col="_all", weight_col="w34", k=20,
        key_col="word", seed=7)
    return out.select("word", "cnt",
                      F.col("rank").cast("long").alias("rank"))


SQL_NEGATIVE_SAMPLE = r"""
WITH wc AS (
  SELECT tok AS word, count(*) AS cnt
  FROM (SELECT unnest(list_filter(
                 regexp_split_to_array(lower(text), '\s+'),
                 x -> x <> '')) AS tok
        FROM documents)
  GROUP BY 1
),
c AS (
  SELECT word, cnt,
         -ln((('0x' || substr(md5('7|' || word), 1, 15))::BIGINT + 1)
             / 1152921504606846976.0)
           / (sqrt(cnt) * sqrt(sqrt(cnt))) AS clock
  FROM wc
),
r AS (
  SELECT word, cnt,
         row_number() OVER (ORDER BY clock, word) AS rank
  FROM c
)
SELECT word, cnt, rank FROM r WHERE rank <= 20
"""
