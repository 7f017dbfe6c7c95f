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
            # the two halves of the ingest partition the responses:
            # rows _media_response claims go to crawl_media (tag-
            # stripping image/audio/video bytes yields garbage "text"
            # documents), everything else — including octet-stream
            # responses WITHOUT media magic, a common mislabel for
            # plain text — stays a document
            .filter(~_media_response(F.col("content_type"),
                                     F.col("content")))
            .select(
                F.xxhash64("path", "record_no").alias("doc_id"),
                normalize_url(F.col("target_uri")).alias("url"),
                url_host(F.col("target_uri")).alias("_host"),
                "content_type", "warc_date", "text")
            .filter(token_count(F.col("text")) >= min_tokens))
    docs = _with_domain(docs, spark, psl_rules, heuristic_domains)
    return docs.select(*DOC_COLUMNS)


def _with_domain(df: DataFrame, spark: SparkSession, psl_rules,
                 heuristic_domains: bool) -> DataFrame:
    """Attach ``domain`` from the ``_host`` column — PSL broadcast-join
    extraction by default, the expression-only heuristic on request.
    Shared by the document and media halves of the ingest so per-domain
    caps and domain mixtures bucket both the same way."""
    from kiji_mapreduce_spark.pipeline.text import registered_domain

    if heuristic_domains:
        return df.withColumn("domain", registered_domain(F.col("_host")))
    from kiji_mapreduce_spark.pipeline import psl as psl_mod

    rules = psl_rules if psl_rules is not None \
        else psl_mod.snapshot_rules()
    return psl_mod.with_registered_domain(
        df, "_host", "domain", rules=rules, spark=spark)


MEDIA_COLUMNS = ("media_id", "url", "domain", "content_type", "kind",
                 "warc_date", "content")

#: body-prefix magic -> perceptual-code kind, for responses whose
#: Content-Type header is missing or wrong (real crawls mislabel media
#: constantly); checked in order, WAVE confirmed past the RIFF header
_MAGIC_KINDS = ((b"\x89PNG\r\n\x1a\n", "image"),
                (b"\xff\xd8\xff", "image"),  # JPEG SOI
                (b"MPNG", "video"))  # the engine's Motion-PNG container

#: Catalyst-side contains() probes for the same magics — each sequence
#: chosen to be implausible INSIDE text so the document half can use
#: ~_media_response without dropping prose that merely mentions a
#: format: full 8-byte PNG magic, binary JPEG SOI, Motion-PNG magic
#: with its version byte, and the contiguous "WAVEfmt " chunk pair
#: (bare "RIFF"/"WAVE" words appear in real pages about audio).
#: contains() is position-blind; the Python side re-checks exact body
#: PREFIXES (_sniff_kind), so a probe false-positive costs one row
#: through Arrow, never a wrong kind.
_MAGIC_PROBES = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"MPNG\x01",
                 b"WAVEfmt ")


def _sniff_kind(body: bytes) -> str | None:
    for magic, kind in _MAGIC_KINDS:
        if body.startswith(magic):
            return kind
    if body[:4] == b"RIFF" and body[8:12] == b"WAVE":
        return "audio"
    return None


def _media_response(ctype, content):
    """Boolean Column: does this response belong to the MEDIA half of
    the ingest? Declared image/audio/video Content-Type, or an untyped
    / octet-stream response whose bytes carry media magic. The document
    half filters on the NEGATION, so the two halves partition the
    responses: nothing is ingested twice. The one asymmetric corner is
    an untyped TEXT page that embeds a probe sequence mid-prose — the
    probe claims it for media and the prefix sniff then drops it —
    which is why ``_MAGIC_PROBES`` holds only sequences implausible
    inside text."""
    probe = F.lit(False)
    for magic in _MAGIC_PROBES:
        probe = probe | F.contains(content, F.lit(magic))
    return ctype.rlike("^(image|audio|video)/") | (
        ctype.isin("", "application/octet-stream") & probe)


def crawl_media(records: DataFrame, spark: SparkSession,
                psl_rules=None,
                heuristic_domains: bool = False) -> DataFrame:
    """WARC record rows -> media-shaped rows (``MEDIA_COLUMNS``): the
    image/audio/video responses of a crawl, bodies extracted to raw
    bytes, typed by Content-Type with magic-byte sniffing as backstop —
    the other half of the ingest, feeding the perceptual dedup stack
    (``multimodal.media_dedup_incremental`` / ``kiji-mr media-dedup``
    read these rows directly: default ``media_id``/``content`` columns).

    Scale shape: a pure-Catalyst pre-filter on the header block's
    Content-Type (plus magic probes for untyped responses) runs BEFORE
    the Arrow boundary, so HTML and other non-media payloads — the
    overwhelming bulk of a crawl — never cross into Python; the byte-
    exact header/body split happens in one ``mapInPandas`` over the
    surviving media rows, whose bytes must reach Python anyway for
    perceptual decoding. ``media_id`` is the same deterministic
    ``xxhash64(path, record_no)`` the document ingest mints, so a doc
    and a media row from one record share an id and re-ingests keep
    dedup indexes stable.
    """
    import pandas as pd

    from kiji_mapreduce_spark.pipeline.text import http_content_type

    cand = (records
            .filter(F.col("warc_type") == "response")
            .withColumn("content_type",
                        http_content_type(F.col("content")))
            .filter(_media_response(F.col("content_type"),
                                    F.col("content"))))

    schema = ("media_id long, url string, _host string, "
              "content_type string, kind string, warc_date string, "
              "content binary")

    def _extract(batches):
        in_cols = ("media_id", "url", "_host", "content_type",
                   "warc_date", "content")
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "url", "_host",
                                    "content_type", "kind",
                                    "warc_date", "content")}
            for mid, url, host, ct, date, content in zip(
                    *(pdf[c] for c in in_cols)):
                body = bytes(content)
                if body.startswith(b"HTTP/"):
                    cut = body.find(b"\r\n\r\n")
                    if cut < 0:
                        continue  # headers never terminated: skip
                    body = body[cut + 4:]
                ct = ct or ""
                kind = next((k for p, k in (("image/", "image"),
                                            ("audio/", "audio"),
                                            ("video/", "video"))
                             if ct.startswith(p)), None) \
                    or _sniff_kind(body)
                if kind is None:
                    continue  # magic probe false-positive: not media
                rows["media_id"].append(mid)
                rows["url"].append(url)
                rows["_host"].append(host)
                rows["content_type"].append(ct)
                rows["kind"].append(kind)
                rows["warc_date"].append(date)
                rows["content"].append(body)
            yield pd.DataFrame(rows)

    from kiji_mapreduce_spark.pipeline.text import normalize_url, url_host

    media = (cand.select(
        F.xxhash64("path", "record_no").alias("media_id"),
        normalize_url(F.col("target_uri")).alias("url"),
        url_host(F.col("target_uri")).alias("_host"),
        "content_type", "warc_date", "content")
        .mapInPandas(_extract, schema))
    media = _with_domain(media, spark, psl_rules, heuristic_domains)
    return media.select(*MEDIA_COLUMNS)
