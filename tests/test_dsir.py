"""DSIR importance resampling (Xie et al. 2023): hashed n-gram
features, the fitted bucket models, log weights vs a hand
computation, and the end-to-end target-seeking resample."""

import hashlib
import math

from kiji_mapreduce_spark.pipeline import dsir


def _bucket(gram: str, dim: int) -> int:
    # token_hash64(md5) = first 15 md5 hex chars as a long, then pmod
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % dim


def _grams(text: str) -> list[str]:
    toks = text.lower().split()
    return toks + [" ".join(toks[i:i + 2])
                   for i in range(len(toks) - 1)]


def test_hashed_ngram_counts(spark):
    """Counts cover unigrams + bigrams with repetition, bucket ids
    match the md5 hash arithmetic, NULL/empty docs vanish."""
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None), (3, "")],
        "doc_id long, text string")
    rows = dsir.hashed_ngram_counts(df, dim=50, hash_fn="md5").collect()
    assert {r.doc_id for r in rows} == {1}
    got = {r.bucket: r.cnt for r in rows}
    expect: dict[int, int] = {}
    for g in _grams("alpha beta alpha"):  # 3 unigrams + 2 bigrams
        b = _bucket(g, 50)
        expect[b] = expect.get(b, 0) + 1
    assert got == expect
    assert sum(got.values()) == 5


def test_dsir_log_weights_match_hand_computation(spark):
    """log_w == sum_b counts_b * (log p_b - log q_b) with Laplace
    smoothing, reproduced gram-for-gram in pure Python."""
    dim, smoothing = 50, 1.0
    raw_docs = [(1, "alpha beta gamma"), (2, "delta delta echo")]
    tgt_docs = [(10, "alpha beta"), (11, "alpha gamma")]
    raw = spark.createDataFrame(raw_docs, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_docs, "doc_id long, text string")
    got = {r.doc_id: r.log_w for r in
           dsir.dsir_log_weights(raw, tgt, dim=dim, hash_fn="md5",
                                 smoothing=smoothing).collect()}

    def fit(docs):
        totals = [0.0] * dim
        for _, t in docs:
            for g in _grams(t):
                totals[_bucket(g, dim)] += 1
        denom = sum(totals) + smoothing * dim
        return [round(math.log((t + smoothing) / denom), 12)
                for t in totals]

    log_p, log_q = fit(tgt_docs), fit(raw_docs)
    for doc_id, text in raw_docs:
        want = round(sum(
            cnt * (log_p[b] - log_q[b])
            for b, cnt in _count(text, dim).items()), 9)
        assert got[doc_id] == want


def test_bucket_log_probs_matches_fused_fit(spark):
    """The standalone ``bucket_log_probs`` and ``dsir_log_weights``'
    fused one-job fit share one arithmetic (r13 review finding: two
    inlined copies could drift): fitting the same corpus standalone
    reproduces the hand fit exactly, including the 12-dp rounding."""
    dim, smoothing = 50, 1.0
    docs = [(1, "alpha beta gamma"), (2, "delta delta echo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts = dsir.hashed_ngram_counts(df, dim=dim, hash_fn="md5")
    got = dsir.bucket_log_probs(counts, dim=dim, smoothing=smoothing)

    totals = [0.0] * dim
    for _, t in docs:
        for g in _grams(t):
            totals[_bucket(g, dim)] += 1
    denom = sum(totals) + smoothing * dim
    want = [round(math.log((t + smoothing) / denom), 12)
            for t in totals]
    assert got == want


def _count(text: str, dim: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for g in _grams(text):
        b = _bucket(g, dim)
        out[b] = out.get(b, 0) + 1
    return out


def test_dsir_resample_prefers_target_like(spark):
    """End to end: raw docs sharing the target's vocabulary carry
    exp()-scale higher importance weights, so the resample selects
    exactly them; selection is deterministic under a fixed seed."""
    target_text = ("the encyclopedia article describes the history "
                   "of science and mathematics in careful prose")
    junk_text = "zzz qqq xxx www vvv uuu ttt sss rrr ppp"
    raw_rows = ([(i, target_text + f" section {i}.") for i in range(4)]
                + [(100 + i, junk_text + f" {i}") for i in range(6)])
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(0, target_text), (1, target_text + " with more history.")],
        "doc_id long, text string")
    picked = dsir.dsir_resample(raw, tgt, k=4, dim=200, hash_fn="md5",
                                seed=7)
    ids = sorted(r.doc_id for r in picked.collect())
    assert ids == [0, 1, 2, 3]
    again = sorted(r.doc_id for r in
                   dsir.dsir_resample(raw, tgt, k=4, dim=200,
                                      hash_fn="md5", seed=7).collect())
    assert again == ids
    cols = set(picked.columns)
    assert {"doc_id", "text", "log_w", "rank"} <= cols
    assert "_w" not in cols and "_stratum" not in cols


def test_cli_dsir(spark, tmp_path, capsys):
    """kiji-mr dsir end to end: raw + target parquet in, selected
    parquet out with log_w attached, stats JSON on stdout."""
    import json as _json

    from kiji_mapreduce_spark import cli

    target_text = ("the encyclopedia article describes the history "
                   "of science and mathematics in careful prose")
    junk_text = "zzz qqq xxx www vvv uuu ttt sss rrr ppp"
    raw = spark.createDataFrame(
        [(i, target_text + f" section {i}.") for i in range(3)]
        + [(100 + i, junk_text + f" {i}") for i in range(5)],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(0, target_text)], "doc_id long, text string")
    raw.write.parquet(f"{tmp_path}/raw")
    tgt.write.parquet(f"{tmp_path}/target")

    rc = cli.main([
        "dsir", "--raw", f"{tmp_path}/raw",
        "--target", f"{tmp_path}/target",
        "--output", f"{tmp_path}/picked", "--k", "3",
        "--dim", "200"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_out"] == 3 and stats["k"] == 3
    picked = spark.read.parquet(f"{tmp_path}/picked")
    assert sorted(r.doc_id for r in picked.collect()) == [0, 1, 2]
    assert "log_w" in picked.columns


def test_dsir_resample_k_near_n_underflow_floor(spark):
    """A doc hundreds of nats below the best stays pickable: with k
    == n every row comes back even though exp(log_w - max)
    underflows to zero for the junk doc."""
    target_text = " ".join(["history science article prose"] * 60)
    raw = spark.createDataFrame(
        [(0, target_text),
         (1, " ".join(f"junkword{i}" for i in range(400)))],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(0, target_text)], "doc_id long, text string")
    picked = dsir.dsir_resample(raw, tgt, k=2, dim=100, hash_fn="md5")
    assert sorted(r.doc_id for r in picked.collect()) == [0, 1]


def test_dsir_log_weights_match_duckdb_oracle(spark):
    """Cross-engine evidence for the future oracle seat: the whole
    DSIR weight job — md5 bucket hashing, Laplace-smoothed target and
    raw bucket models, per-doc count-weighted log-ratio sum —
    reproduced in DuckDB SQL; weights match to the committed 9 dp
    rounding."""
    import duckdb

    dim, alpha = 64, 1.0
    raw_rows = [(i, " ".join(
        ["alpha beta gamma delta", "epsilon zeta eta theta",
         "iota kappa lambda mu"][i % 3] for _ in range(2 + i % 3)))
        for i in range(30)]
    tgt_rows = [(100 + i, "alpha beta gamma delta epsilon zeta")
                for i in range(5)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    got = {r.doc_id: r.log_w for r in
           dsir.dsir_log_weights(raw, tgt, dim=dim, hash_fn="md5",
                                 smoothing=alpha).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE raw(doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE tgt(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", raw_rows)
    con.executemany("INSERT INTO tgt VALUES (?, ?)", tgt_rows)
    grams = """
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text),
               '\\s+'), t -> t != '') AS tk FROM {src}),
      uni AS (
        SELECT doc_id, unnest(tk) AS g FROM toks),
      bi AS (
        SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
        FROM toks, unnest(range(1, length(tk))) AS r(i)),
      allg AS (SELECT * FROM uni UNION ALL SELECT * FROM bi)
      SELECT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {dim} AS bucket,
             count(*) AS cnt
      FROM allg GROUP BY 1, 2
    """
    con.execute("CREATE VIEW raw_counts AS "
                + grams.format(src="raw", dim=dim))
    con.execute("CREATE VIEW tgt_counts AS "
                + grams.format(src="tgt", dim=dim))
    model = """
      CREATE VIEW {name} AS
      WITH b AS (SELECT unnest(range(0, {dim})) AS bucket),
      tot AS (SELECT bucket, sum(cnt)::DOUBLE AS n
              FROM {src} GROUP BY 1),
      d AS (SELECT sum(cnt)::DOUBLE + {alpha} * {dim} AS denom
            FROM {src})
      SELECT b.bucket,
             round(ln((coalesce(tot.n, 0) + {alpha}) / d.denom), 12)
               AS logp
      FROM b LEFT JOIN tot USING (bucket), d
    """
    con.execute(model.format(name="log_p", src="tgt_counts",
                             dim=dim, alpha=alpha))
    con.execute(model.format(name="log_q", src="raw_counts",
                             dim=dim, alpha=alpha))
    want = dict(con.execute("""
      SELECT rc.doc_id,
             round(sum(rc.cnt * (p.logp - q.logp)), 9)
      FROM raw_counts rc
      JOIN log_p p USING (bucket) JOIN log_q q USING (bucket)
      GROUP BY 1""").fetchall())
    assert got == want


def test_hashed_ngram_counts_duplicate_ids_stay_row_local(spark):
    """r13 review finding: with duplicate doc_ids the lead()-window
    featurize must keep bigrams ROW-local (the old per-row array form
    never crossed rows) — counts for a duplicated id equal the sum of
    the two rows' own grams, with no cross-row bigram."""
    df = spark.createDataFrame(
        [(1, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        "doc_id long, text string")
    rows = dsir.hashed_ngram_counts(
        df.repartition(5), dim=64, hash_fn="md5").collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.bucket] = r.cnt
    # doc 1 = grams of both rows summed: alpha, beta, gamma, delta,
    # 'alpha beta', 'gamma delta' — NOT 'beta gamma'
    expect1: dict[int, int] = {}
    for g in ["alpha", "beta", "alpha beta", "gamma", "delta",
              "gamma delta"]:
        b = _bucket(g, 64)
        expect1[b] = expect1.get(b, 0) + 1
    assert got[1] == expect1
    cross = _bucket("beta gamma", 64)
    # the forbidden cross-row bigram's bucket carries no EXTRA count
    assert got[1].get(cross, 0) == expect1.get(cross, 0)


def test_dsir_target_pred_matches_explicit_target(spark):
    """The r15 subset seam: target_pred (deriving the p-side counts by
    filtering the checkpointed raw featurize) must produce exactly the
    log weights of featurizing the same slice as an explicit target
    DataFrame — featurization is per-document, so the two forms are
    algebraically identical."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} alpha beta tok{i % 3}") for i in range(40)]
        + [(40, None), (41, "")],
        "doc_id long, text string")
    pred = F.col("doc_id") % 10 == 3
    via_pred = {r.doc_id: r.log_w for r in dsir.dsir_log_weights(
        df, dim=32, hash_fn="md5", target_pred=pred).collect()}
    via_target = {r.doc_id: r.log_w for r in dsir.dsir_log_weights(
        df, df.filter(pred), dim=32, hash_fn="md5").collect()}
    assert via_pred == via_target


def test_dsir_target_and_pred_mutually_exclusive(spark):
    import pytest

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        dsir.dsir_log_weights(df)
    with pytest.raises(ValueError, match="exactly one"):
        dsir.dsir_log_weights(df, df, target_pred=F.col("doc_id") > 0)
