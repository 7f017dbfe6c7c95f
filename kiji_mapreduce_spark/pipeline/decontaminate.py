"""Benchmark decontamination for training-data pipelines.

Before training, corpora are scrubbed of documents that overlap an
evaluation/benchmark set (the n-gram-overlap rule popularized by the
GPT-3/PaLM data pipelines): a training document is *contaminated* when a
large fraction of its word n-grams also appear in any benchmark document.

Scale shape: both sides reduce to distinct hashed shingles
(``dedup.shingle_hashes`` — posexplode + window grams, codegen'd; only
64-bit longs shuffle, never text). The benchmark side is tiny relative
to a 100 TB corpus (eval sets are MBs), so the membership probe is a
broadcast left-semi join — the corpus never shuffles at all; per-doc
counts aggregate map-side. With ``broadcast_benchmark=False`` the probe
becomes a shuffled semi-join on the hash for benchmark sets too large to
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kiji_mapreduce_spark.pipeline.dedup import shingle_hashes


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xx",
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per document: overlap of its distinct word n-grams with the
    benchmark's n-gram union.

    Returns (id, n_grams, n_hit, overlap_frac, contaminated) — one row
    per document with at least one token; ``contaminated`` is
    ``overlap_frac >= threshold``. ``hash_fn="md5"`` makes the result
    reproducible in any SQL engine (the suite's oracle mode).
    """
    cand = shingle_hashes(docs, text_col, id_col, n, hash_fn).distinct()
    bench = (shingle_hashes(benchmark, text_col, id_col, n, hash_fn)
             .select("_h").distinct())
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = (cand.join(bench, on="_h", how="left_semi")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hit")))
    totals = cand.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    out = totals.join(hits, on=id_col, how="left").select(
        id_col, "n_grams",
        F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"))
    frac = F.round(F.col("n_hit") / F.col("n_grams"), 4)
    return out.select(
        id_col, "n_grams", "n_hit", frac.alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"))
