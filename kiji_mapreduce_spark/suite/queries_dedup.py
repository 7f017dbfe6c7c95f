"""Deduplication / decontamination / curation queries: exact, MinHash,
SimHash, n-gram Jaccard, embedding LSH near-dups, incremental index,
repeated-n-gram coverage, fuzzy entity resolution, the curation chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from kiji_mapreduce_spark import oracles
from kiji_mapreduce_spark.pipeline import curate, decontaminate, dedup, sample
from kiji_mapreduce_spark.suite.common import _emb, _t


# ---------------------------------------------------------------------------
# training-data pipeline: dedup / text / similarity
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_groups(docs)


SQL_DEDUP_EXACT = """
SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def _resolution_blocker(c):
    """Two fine-grained multi-blocking keys anchored on the LAST token
    (the unique '#<key>' suffix of the synthesized entity names, which
    the corruption never touches): (a) last token + length bucket,
    (b) 2-char prefix + last token. Most true pairs are reached via BOTH
    keys, so the dedup-before-levenshtein step is genuinely exercised."""
    norm = F.lower(F.trim(c))
    toks = F.split(norm, r"\s+")
    last = F.element_at(toks, -1)
    return F.array(
        F.concat_ws("#", F.lit("a"), last,
                    (F.length(norm) / 4).cast("long").cast("string")),
        F.concat_ws("#", F.lit("b"), F.substring(norm, 1, 2), last))


def q_entity_resolution(spark, sf_dir):
    """Blocked fuzzy entity resolution (``entity.fuzzy_match_blocked``):
    match deterministically-corrupted record names back to canonical
    entities by levenshtein distance, candidates confined to blocking-key
    equi-joins (never all-pairs).

    The raw part names are degenerate for this (64 distinct strings), so
    canonical names are synthesized unique — ``p_name || ' #' || key`` —
    and the dirty side deletes one character at a key-dependent position.
    Every step (corruption, blocking keys, distance, tie-break) is
    reproducible in DuckDB (``levenshtein()``), which makes this the
    oracle check for the entity-resolution operator."""
    from kiji_mapreduce_spark.pipeline.entity import fuzzy_match_blocked

    part = _t(spark, sf_dir, "part")
    nm = F.concat(F.col("p_name"), F.lit(" #"),
                  F.col("p_partkey").cast("string"))
    canon = part.select(F.col("p_partkey").alias("cid"), nm.alias("name"))
    dirty = (part.select(F.col("p_partkey").alias("rid"), nm.alias("_nm"),
                         (F.col("p_partkey") % 4 + 2).cast("int")
                         .alias("_dpos"))
             .select("rid", F.expr(
                 "concat(substring(_nm, 1, _dpos - 1), "
                 "substring(_nm, _dpos + 1, length(_nm)))").alias("name")))
    out = fuzzy_match_blocked(
        dirty, canon, record_id="rid", canonical_id="cid",
        record_name="name", canonical_name="name", max_dist=2,
        blocker=_resolution_blocker)
    return out.select("record_id", "canonical_id",
                      F.col("dist").cast("long").alias("dist"))


SQL_ENTITY_RESOLUTION = r"""
WITH canon AS (
  SELECT p_partkey AS cid, p_name || ' #' || p_partkey::VARCHAR AS name
  FROM part),
dirty AS (
  SELECT p_partkey AS rid,
         substr(nm, 1, dpos - 1) || substr(nm, dpos + 1) AS name
  FROM (SELECT p_partkey, p_name || ' #' || p_partkey::VARCHAR AS nm,
               CAST(p_partkey % 4 + 2 AS INT) AS dpos FROM part)),
rk AS (
  SELECT rid, name, unnest([
      'a#' || l[-1] || '#'
          || CAST(floor(length(n) / 4.0) AS BIGINT)::VARCHAR,
      'b#' || substr(n, 1, 2) || '#' || l[-1]]) AS blk
  FROM (SELECT rid, name, lower(trim(name)) AS n,
               str_split_regex(lower(trim(name)), '\s+') AS l
        FROM dirty)),
ck AS (
  SELECT cid, name, unnest([
      'a#' || l[-1] || '#'
          || CAST(floor(length(n) / 4.0) AS BIGINT)::VARCHAR,
      'b#' || substr(n, 1, 2) || '#' || l[-1]]) AS blk
  FROM (SELECT cid, name, lower(trim(name)) AS n,
               str_split_regex(lower(trim(name)), '\s+') AS l
        FROM canon)),
cand AS (
  SELECT DISTINCT r.rid, r.name AS rname, c.cid, c.name AS cname
  FROM rk r JOIN ck c USING (blk)),
scored AS (
  SELECT rid AS record_id, cid AS canonical_id,
         levenshtein(lower(trim(rname)), lower(trim(cname))) AS dist
  FROM cand)
SELECT record_id, canonical_id, dist FROM (
  SELECT *, row_number() OVER (PARTITION BY record_id
                               ORDER BY dist, canonical_id) AS _rk
  FROM scored WHERE dist <= 2)
WHERE _rk = 1
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard on a deterministic pairing
    (doc_id, doc_id+1) — oracle-checks the shingling + set-similarity
    math that backs the MinHash verify stage."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("id_a")).join(
        docs.select((F.col("doc_id") - 1).alias("id_a"),
                    F.col("doc_id").alias("id_b")), on="id_a")
    out = dedup.ngram_jaccard_pairs(docs, pairs, n=3, threshold=0.0)
    return out.select("id_a", "id_b",
                      (F.round("jaccard", 4) + F.lit(0.0)).alias("jaccard"))


SQL_DEDUP_NGRAM_JACCARD = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(w)-2, 1))]
                       ) AS sh
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(a.sh || b.sh)), 4) + 0.0 AS jaccard
FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
"""


def q_pipeline_curate(spark, sf_dir):
    """The flagship LLM-data curation chain, end to end via the
    composable ``curate.curate_corpus`` API: quality filter -> exact
    dedup -> benchmark decontamination -> stratified sample. The oracle
    recomputes the same chain in SQL."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    cfg = curate.CurateConfig(
        min_quality=0.8, decontaminate_n=3, decontaminate_threshold=0.5,
        sample_rates={"en": 0.9}, default_rate=0.5, strata_col="lang",
        seed=7, hash_fn="md5")
    out = curate.curate_corpus(docs, benchmark=bench, config=cfg)
    return out.select(
        "doc_id", "lang", "source", "n_tokens", "quality_score",
        "overlap_frac")


SQL_PIPELINE_CURATE = r"""
WITH f AS (
  SELECT doc_id, text, lang, source,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digits,
         len(list_filter(str_split_regex(lower(text), '\s+'),
             x -> list_contains(['the', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'was', 'for'], x))) AS n_stop
  FROM documents
), r AS (
  SELECT *,
         CASE WHEN n_tokens > 0 THEN (n_chars - n_tokens + 1.0) / n_tokens ELSE 0.0 END AS atl,
         CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS pr,
         CASE WHEN n_chars > 0 THEN n_digits * 1.0 / n_chars ELSE 0.0 END AS dr,
         CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS sr
  FROM f
), q AS (
  SELECT doc_id, text, lang, source, n_tokens,
         round(CAST(
           (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
           (CASE WHEN atl BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END) +
           (CASE WHEN pr <= 0.2 THEN 0.2 ELSE 0.0 END) +
           (CASE WHEN dr <= 0.2 THEN 0.1 ELSE 0.0 END) +
           (CASE WHEN sr >= 0.01 THEN 0.1 ELSE 0.0 END) AS DOUBLE), 2)
           AS quality_score
  FROM r
), quality AS (
  SELECT * FROM q WHERE quality_score >= 0.8
), dd AS (
  SELECT * FROM quality
  WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY md5(text))
), toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
                             x -> x <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3
         THEN list_transform(range(1, len(t) - 1),
              i -> array_to_string(t[i : i + 2], ' '))
         ELSE [array_to_string(t, ' ')] END AS g
  FROM toks WHERE len(t) >= 1
), ex AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(g,
           x -> ('0x' || substr(md5(x), 1, 15))::BIGINT))) AS h
  FROM grams
), bench AS (
  SELECT DISTINCT h FROM ex WHERE doc_id % 23 = 0
), cand_grams AS (
  SELECT ex.doc_id, ex.h FROM ex
  JOIN dd ON dd.doc_id = ex.doc_id
  WHERE ex.doc_id % 23 <> 0
), overlap AS (
  SELECT doc_id,
         round(sum(CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END)
               * 1.0 / count(*), 4) AS overlap_frac
  FROM cand_grams GROUP BY doc_id
), clean AS (
  SELECT dd.doc_id, dd.lang, dd.source, dd.n_tokens, dd.quality_score,
         overlap.overlap_frac
  FROM dd JOIN overlap ON dd.doc_id = overlap.doc_id
  WHERE overlap.overlap_frac < 0.5
)
SELECT doc_id, lang, source, n_tokens, quality_score, overlap_frac
FROM clean
WHERE ('0x' || substr(md5('7|' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000
      < CASE lang WHEN 'en' THEN 9000 ELSE 5000 END
"""


# -- rows-only ops (no faithful ANSI-SQL oracle) ----------------------------

def q_dedup_corpus_survivors(spark, sf_dir):
    """Full corpus dedup (exact + MinHash near-dup + connected
    components) -> surviving doc ids.

    Oracle-checked end-to-end: the md5-mode token hash is reproducible in
    DuckDB, whose oracle recomputes the same exact-dedup digests, the
    same LSH candidate pairs, and TRUE connected components via a
    recursive CTE (``oracles.corpus_survivors_sql``); the Spark side's
    pointer-jumping label propagation converges to the same labels."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dedup_corpus(
        docs, threshold=0.5, hash_fn="md5").select("doc_id", "lang")


_EMB_LSH = dict(bands=4, planes_per_band=6, seed=42, dim=64, threshold=0.35)


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs via banded hyperplane LSH
    (4 bands x 6 sign bits -> 64 buckets/band) with exact-cosine verify.

    Oracle-checked: the hyperplanes are deterministic literal constants,
    so DuckDB reproduces the band bucketing bit-for-bit with
    ``list_dot_product`` (see ``_embedding_lsh_oracle_sql``) — both
    engines compute the SAME candidate set, then the same cosine filter."""
    emb = _emb(spark, sf_dir)
    p = _EMB_LSH
    pairs = dedup.embedding_near_duplicates(
        emb, threshold=p["threshold"], bands=p["bands"],
        planes_per_band=p["planes_per_band"], seed=p["seed"])
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _embedding_lsh_oracle_sql() -> str:
    """DuckDB mirror of ``dedup.embedding_lsh_candidates`` + cosine
    verify: same literal planes, same band/bucket arithmetic, same
    threshold. Generated, not hand-written, so the two sides cannot
    drift."""
    from kiji_mapreduce_spark.pipeline.similarity import _plane

    p = _EMB_LSH
    band_selects = []
    for b in range(p["bands"]):
        bucket_terms = []
        for pi in range(p["planes_per_band"]):
            comps = _plane(p["seed"] + 7919 * b, pi, p["dim"])
            lit = "[" + ", ".join(repr(c) for c in comps) + "]"
            weight = 2 ** (p["planes_per_band"] - 1 - pi)
            bucket_terms.append(
                f"(CASE WHEN list_dot_product(v, {lit}) >= 0 "
                f"THEN {weight} ELSE 0 END)")
        band_selects.append(
            f"SELECT vec_id, {b} AS band, "
            + " + ".join(bucket_terms) + " AS bucket FROM e")
    entries = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
entries AS (
{entries}
),
cands AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM entries a JOIN entries b USING (band, bucket)
  WHERE a.vec_id < b.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b,
         list_dot_product(ea.v, eb.v)
         / (sqrt(list_dot_product(ea.v, ea.v))
            * sqrt(list_dot_product(eb.v, eb.v))) AS raw_cos
  FROM cands
  JOIN e ea ON ea.vec_id = id_a
  JOIN e eb ON eb.vec_id = id_b
)
SELECT id_a, id_b, round(raw_cos, 6) AS cosine
FROM scored WHERE raw_cos >= {p["threshold"]}
"""


def q_dedup_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs verified by exact Jaccard (>= 0.5).

    Oracle-checked: md5-mode shingle hashes + the same literal (a, b)
    permutation constants reproduce the identical signatures, band
    buckets, candidate pairs, and Jaccard values in DuckDB
    (``oracles.minhash_pairs_sql``)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup(docs, threshold=0.5, hash_fn="md5")
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_source_matrix(spark, sf_dir):
    """Which sources duplicate which: MinHash-verified near-dup pairs
    labeled by source, counted per unordered source pair — the corpus-
    mix overlap diagnostic (re-crawl detection). The pair set is tiny
    after LSH+verify, so the labeling joins broadcast it; the corpus
    never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup(docs, threshold=0.5, hash_fn="md5")
    return dedup.near_dup_source_matrix(pairs, docs)


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 10), oracle-checked via the
    md5-mode token hash (``oracles.simhash_pairs_sql`` recomputes the
    same 64 bit votes, band chunks, and hamming distances)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_duplicates(
        docs, max_hamming=10, bands=4, hash_fn="md5")


def q_dedup_incremental_pairs(spark, sf_dir):
    """Incremental dedup: even doc_ids play the already-indexed corpus
    (only their ``minhash_index`` rows are touched — no corpus text),
    odd doc_ids are the new ingest batch. Emits verified pairs with at
    least one new side. Oracle: the full-corpus minhash pairs filtered
    to the same condition — the incremental path must find exactly the
    pairs the batch path would."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    # checkpoint stands in for the production persisted index table —
    # minhash_dedup_incremental reads it twice (band entries + verify
    # sets), and the steady state never recomputes it from text.
    # r14 optimization: ONE fused index build over the whole table
    # (grouping is per-doc, so the per-half index rows are identical),
    # then filter the even/odd halves out of the single checkpoint —
    # one text scan + one shuffle + one materialization job instead of
    # two of each (profiled: the two sequential checkpoint jobs were
    # ~1.3 s of the query's 3.2 s at sf0.1).
    combined = dedup.minhash_index(docs, hash_fn="md5") \
        .localCheckpoint(eager=True)
    index = combined.filter(F.col("doc_id") % 2 == 0)
    pairs = dedup.minhash_dedup_incremental(
        new, index, threshold=0.5, hash_fn="md5",
        new_index=combined.filter(F.col("doc_id") % 2 == 1))
    return pairs.select("id_a", "id_b",
                        F.round("jaccard", 6).alias("jaccard"))


def q_decontaminate_overlap(spark, sf_dir):
    """Benchmark decontamination: every 23rd document plays the eval set;
    the rest are scored by the fraction of their distinct 3-gram hashes
    found in the benchmark union (broadcast semi-join probe — the corpus
    side never shuffles)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    cand = docs.filter(F.col("doc_id") % 23 != 0)
    return decontaminate.ngram_overlap(
        cand, bench, n=3, hash_fn="md5", threshold=0.5)


def q_decontaminate_spans(spark, sf_dir):
    """Span-level decontamination: for every candidate doc, the merged
    token ranges whose 3-grams hit the benchmark union (gaps-and-islands
    over hit positions — the redaction view; pipelines cut the span,
    not the document)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    cand = docs.filter(F.col("doc_id") % 23 != 0)
    return decontaminate.contaminated_spans(
        cand, bench, n=3, hash_fn="md5")


def q_dedup_repeated_ngrams(spark, sf_dir):
    """Span-level duplication measurement (Lee et al. 2022): per
    document, the fraction of token positions covered by a 3-gram
    occurring in >= 2 distinct documents. One positional-gram scan
    (checkpointed for its three consumers), a longs-only frequency
    groupBy, a semi-join hit probe, and a window over hits only."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.repeated_ngram_coverage(docs, n=3, min_docs=2,
                                         hash_fn="md5")


def q_dedup_boilerplate_strip(spark, sf_dir):
    """CCNet-style boilerplate-line stripping, oracle-checked end to
    end: synthesize deterministic multi-line documents from the
    corpus (a shared nav line, a short structural line the
    min_line_chars exemption must keep, a 1-in-7 category line over
    the document-frequency threshold, a 1-in-29 group line under it,
    a mostly-unique text prefix, a unique permalink), run the REAL
    ``drop_boilerplate_lines`` operator, and return the rebuilt text
    + drop counts. The DuckDB oracle recomputes frequency, threshold
    (floor + strict >, mirroring the operator's int() truncation),
    the short-line exemption and the order-preserving rebuild."""
    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("NAV MENU home products contact cookie notice"),
            F.lit("--"),
            F.concat(F.lit("cat "), (F.col("doc_id") % 7)
                     .cast("string")),
            F.concat(F.lit("grp "), (F.col("doc_id") % 29)
                     .cast("string")),
            # newline-strip BEFORE slicing: the corpus carries none
            # today, but the oracle models the prefix as ONE
            # unsplittable list element while the operator splits on
            # \n — a future newline-bearing corpus would silently
            # diverge the two (r11 review finding)
            F.substring(F.regexp_replace(F.col("text"), "[\\n\\r]",
                                         " "), 1, 40),
            F.concat(F.lit("permalink "), F.col("doc_id")
                     .cast("string")),
        ).alias("text"))
    out = dedup.drop_boilerplate_lines(synth, max_doc_frac=0.05)
    return out.select("doc_id",
                      F.col("text").alias("stripped_text"),
                      "n_lines_dropped")


SQL_BOILERPLATE_STRIP = r"""
WITH synth AS (
  SELECT doc_id,
         ['NAV MENU home products contact cookie notice',
          '--',
          'cat ' || (doc_id % 7),
          'grp ' || (doc_id % 29),
          substr(regexp_replace(text, '[\n\r]', ' ', 'g'), 1, 40),
          'permalink ' || doc_id] AS ls
  FROM documents
), lines AS (
  SELECT doc_id, unnest(ls) AS line,
         generate_subscripts(ls, 1) AS line_no
  FROM synth
), freq AS (
  SELECT line, count(DISTINCT doc_id) AS nd
  FROM lines WHERE length(trim(line)) >= 4
  GROUP BY line
), boiler AS (
  SELECT line FROM freq
  WHERE nd > greatest(2, CAST(floor(
        0.05 * (SELECT count(DISTINCT doc_id) FROM synth)) AS BIGINT))
)
SELECT l.doc_id,
       string_agg(l.line, chr(10) ORDER BY l.line_no)
           AS stripped_text,
       CAST(6 - count(*) AS INTEGER) AS n_lines_dropped
FROM lines l ANTI JOIN boiler b USING (line)
GROUP BY l.doc_id
"""


def q_dedup_exact_substring(spark, sf_dir):
    """ExactSubstr token-span dedup (Lee et al. 2022), oracle-checked
    end to end on the raw documents table: at min_tokens=8 the corpus
    (~60-token docs over a small vocabulary) naturally carries >1k
    duplicated windows, so the fixture rewrites real text. The DuckDB
    oracle replays the whole chain grouped by window TEXT (the
    operator's 64-bit window hash is an equi-grouping of the same
    key), picks the identical min-(doc_id, pos) winner, unions the
    losers' covered positions and rebuilds each document from its
    surviving tokens in order."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.exact_substring_dedup(docs, min_tokens=8)
    return out.select("doc_id",
                      F.col("text").alias("stripped_text"),
                      "tokens_dropped")


SQL_EXACT_SUBSTRING = r"""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(
             regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'),
             ' '), x -> x <> '') AS t
  FROM documents
), w AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(t[i:i+7], ' ') AS win
  FROM toks, LATERAL unnest(range(1, greatest(len(t) - 6, 1))) AS g(i)
), marked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY win
                            ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY win) AS cnt
  FROM w
), rm AS (
  SELECT DISTINCT doc_id, pos + j AS tok_pos
  FROM marked, LATERAL unnest(range(0, 8)) AS g(j)
  WHERE cnt > 1 AND rn > 1
), rmc AS (
  SELECT doc_id, count(*) AS n_rm FROM rm GROUP BY doc_id
), tokrows AS (
  SELECT doc_id, unnest(t) AS tok,
         generate_subscripts(t, 1) - 1 AS idx
  FROM toks
), kept AS (
  SELECT tr.doc_id, string_agg(tr.tok, ' ' ORDER BY tr.idx) AS new_text
  FROM tokrows tr
  ANTI JOIN rm ON tr.doc_id = rm.doc_id AND tr.idx = rm.tok_pos
  GROUP BY tr.doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(k.new_text, '') END AS stripped_text,
       CAST(coalesce(r.n_rm, 0) AS INTEGER) AS tokens_dropped
FROM toks d
LEFT JOIN kept k ON d.doc_id = k.doc_id
LEFT JOIN rmc r ON d.doc_id = r.doc_id
"""
