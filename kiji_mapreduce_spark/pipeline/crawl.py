"""Crawl ingest chain: WARC response records -> documents-shaped rows.

The one transformation both ingest surfaces share — the ``kiji-mr
crawl-ingest`` CLI (batch) and ``streaming.jobs.stream_crawl_ingest``
(continuous segment arrival) — so the two cannot drift: HTML text
extraction (pure Catalyst), URL canonicalization, PSL registered
domains (broadcast rule-table joins), deterministic
``xxhash64(path, record_no)`` doc ids (re-ingesting the same archive
mints the same ids, keeping downstream dedup indexes and splits
stable), and the min-token gate.

Reference anchor: the bulk-import half of the SURVEY §3.3 lifecycle
(``.../bulkimport/KijiBulkImporter.java:50-118``) realized on crawl
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_COLUMNS = ("doc_id", "url", "domain", "content_type", "warc_date",
               "text")


def crawl_documents(records: DataFrame, spark: SparkSession,
                    min_tokens: int = 1,
                    psl_rules=None,
                    heuristic_domains: bool = False) -> DataFrame:
    """WARC record rows (``read_warc_records`` /
    ``warc_records_from_files`` output) -> documents-shaped rows
    (``DOC_COLUMNS``).

    ``psl_rules``: a ``psl.PSLRules`` (default: the vendored snapshot)
    driving the broadcast-join registered-domain extraction;
    ``heuristic_domains=True`` selects the expression-only fallback
    instead.
    """
    from kiji_mapreduce_spark.pipeline.text import (
        http_html_text, normalize_url, registered_domain, token_count,
        url_host)

    responses = records.filter(F.col("warc_type") == "response")
    docs = (http_html_text(responses)
            .select(
                F.xxhash64("path", "record_no").alias("doc_id"),
                normalize_url(F.col("target_uri")).alias("url"),
                url_host(F.col("target_uri")).alias("_host"),
                "content_type", "warc_date", "text")
            .filter(token_count(F.col("text")) >= min_tokens))
    if heuristic_domains:
        docs = docs.withColumn(
            "domain", registered_domain(F.col("_host")))
    else:
        from kiji_mapreduce_spark.pipeline import psl as psl_mod

        rules = psl_rules if psl_rules is not None \
            else psl_mod.snapshot_rules()
        docs = psl_mod.with_registered_domain(
            docs, "_host", "domain", rules=rules, spark=spark)
    return docs.select(*DOC_COLUMNS)
