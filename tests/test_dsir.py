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
