"""Blocked fuzzy entity resolution: match dirty records to canonical
entities by edit distance, without the all-pairs cross product.

The record-linkage step of a curation pipeline (merge near-identical
author / site / organization strings before grouping by entity).
Classic blocking: candidate pairs come ONLY from an equi-join on a
blocking key (prefix, soundex-ish signature, length bucket, ...), so
the quadratic distance computation is confined to within-block pairs —
the same candidate-containment structure as the MinHash/SimHash band
joins in ``pipeline.dedup``, with ``levenshtein`` (JVM built-in) as the
verifier instead of Jaccard.

A blocker may emit an ARRAY of keys (multi-blocking: union of several
weak blockings raises recall); pairs reached through several keys are
deduplicated BEFORE the distance computation, so each surviving pair
pays levenshtein exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def blocking_keys(name: Column, prefix_len: int = 4) -> Column:
    """Default multi-blocker: lowercase prefix + length bucket, and the
    first token — two weak keys whose union covers most small typos."""
    norm = F.lower(F.trim(name))
    return F.array(
        F.concat_ws("#", F.substring(norm, 1, prefix_len),
                    (F.length(norm) / 4).cast("long").cast("string")),
        F.concat_ws("#", F.lit("tok"), F.split(norm, r"\s+").getItem(0)),
    )


def fuzzy_match_blocked(
    records: DataFrame,
    canonical: DataFrame,
    record_id: str,
    canonical_id: str,
    record_name: str,
    canonical_name: str,
    max_dist: int = 2,
    blocker=blocking_keys,
) -> DataFrame:
    """Best canonical match per record: (record_id, canonical_id, dist).

    Candidates = equi-join on exploded blocking keys; verification =
    exact ``levenshtein <= max_dist``; resolution = lowest distance with
    ``canonical_id`` as the deterministic tie-break (one window over the
    small verified-candidate set). Records with no candidate within
    ``max_dist`` are absent from the result (left to the caller —
    unmatched usually means "new entity").
    """
    # NULL/blank names can never be a meaningful match, but they CAN
    # wreck the blocking: concat_ws skips NULLs, so every NULL name
    # lands in the constant ("", "tok") blocks — a quadratic
    # |null records| x |null canonicals| hot-bucket blowup — and
    # whitespace-only names pass levenshtein("","")=0, confidently
    # "matching" every blank record to the lowest-id blank entity
    # (r13 review finding). Unmatchable rows are dropped here, the
    # same contract as no-candidate-within-max_dist records.
    named = lambda df, col: df.filter(
        F.length(F.trim(F.coalesce(F.col(col), F.lit("")))) > 0)
    rec = named(records, record_name).select(
        F.col(record_id).alias("record_id"),
        F.col(record_name).alias("_rname"),
        F.explode(blocker(F.col(record_name))).alias("_blk"))
    can = named(canonical, canonical_name).select(
        F.col(canonical_id).alias("canonical_id"),
        F.col(canonical_name).alias("_cname"),
        F.explode(blocker(F.col(canonical_name))).alias("_blk"))
    cand = (rec.join(can, on="_blk")
            .select("record_id", "_rname", "canonical_id", "_cname")
            .distinct())
    dist = F.levenshtein(F.lower(F.trim(F.col("_rname"))),
                         F.lower(F.trim(F.col("_cname"))))
    w = Window.partitionBy("record_id").orderBy(
        F.col("dist"), F.col("canonical_id"))
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") == 1)
            .select("record_id", "canonical_id", "dist"))
