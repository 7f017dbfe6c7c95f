"""Cross-engine evidence for the exact-substring-dedup seat (the
C4/DSIR precedent: commit the DuckDB cross-check first, seat when a
window slot opens): the ExactSubstr chain (Lee et al. 2022) —
whitespace token windows, min-(doc_id, pos) winner per repeated
window, maximal-span position union, order-preserving rebuild — vs an
independent SQL replay grouped by window TEXT."""

import duckdb
import pytest

from kiji_mapreduce_spark.pipeline import dedup
from kiji_mapreduce_spark.suite.queries_dedup import (
    SQL_EXACT_SUBSTRING, q_dedup_exact_substring)

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    return sorted((int(r[0]), r[1], int(r[2]))
                  for r in con.execute(SQL_EXACT_SUBSTRING).fetchall())


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_exact_substring_matches_duckdb_oracle(spark, sf_dir):
    got = sorted((r.doc_id, r.stripped_text, r.tokens_dropped)
                 for r in q_dedup_exact_substring(spark,
                                                  sf_dir).collect())
    want = _duck(sf_dir)
    assert len(got) == len(want)
    assert got == want

    # the fixture actually rewrites: some documents lose tokens, and
    # no document loses everything it had more of than duplicates
    dropped = [n for _, _, n in got if n > 0]
    assert dropped, "no duplicated 8-token windows in the corpus"


def test_exact_substring_semantics(spark):
    """Hand-checkable fixture: the globally first occurrence keeps
    its text; later occurrences lose the maximal duplicated span
    (overlapping windows union); unique text survives verbatim;
    NULL text stays NULL with zero drops."""
    shared = "a b c d e f g h i"      # 9 tokens: two 8-windows
    docs = spark.createDataFrame(
        [(1, shared + " unique tail one"),
         (2, "prefix two " + shared),
         (3, "totally different words only here nine ten eleven"),
         (4, None)],
        "doc_id long, text string")
    out = {r.doc_id: (r.text, r.tokens_dropped)
           for r in dedup.exact_substring_dedup(
               docs, min_tokens=8).collect()}
    # doc 1 wins (min doc_id): untouched
    assert out[1] == (shared + " unique tail one", 0)
    # doc 2 loses all 9 shared tokens (two overlapping windows union)
    assert out[2] == ("prefix two", 9)
    assert out[3][1] == 0
    assert out[4] == (None, 0)


def test_exact_substring_within_doc_and_validation(spark):
    """A span repeated inside ONE document dedups by the same
    first-position-wins rule, and min_tokens < 2 is rejected."""
    rep = "q w e r t y u i"           # 8 tokens, exactly one window
    docs = spark.createDataFrame(
        [(7, rep + " mid " + rep)],
        "doc_id long, text string")
    out = dedup.exact_substring_dedup(docs, min_tokens=8).collect()[0]
    assert out.text == rep + " mid"
    assert out.tokens_dropped == 8

    with pytest.raises(ValueError, match="min_tokens"):
        dedup.exact_substring_dedup(docs, min_tokens=1)


def test_cli_substr_dedup(spark, tmp_path, capsys):
    """kiji-mr substr-dedup end to end: the repeated window's later
    occurrence loses its tokens, stats JSON reports the drops."""
    import json as _json

    from kiji_mapreduce_spark import cli

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [(0, shared + " unique tail here"),
         (1, "other head " + shared)],
        "doc_id long, text string")
    docs.write.parquet(f"{tmp_path}/docs")

    rc = cli.main(["substr-dedup", "--input", f"{tmp_path}/docs",
                   "--output", f"{tmp_path}/deduped",
                   "--min-tokens", "8"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 2 and stats["n_tokens_dropped"] == 8
    got = {r.doc_id: r.text for r in
           spark.read.parquet(f"{tmp_path}/deduped").collect()}
    assert got[0] == shared + " unique tail here"
    assert got[1] == "other head"


def test_exact_substring_long_doc_linear(spark):
    """r13 verdict 'What's wrong #1' regression pin: a 100k-token
    document that is one 50-token phrase repeated 2000 times must
    dedup in seconds, not minutes. The old interpreted
    F.filter+array_contains rebuild paid O(tokens x removed) ~= 1e10
    comparisons on this fixture; the posexplode + left_anti + sorted
    re-agg rebuild is linear. Doc 1 holds the phrase's sole winning
    copy, so doc 2's loser windows interval-merge into ONE [0, 100000)
    span: every token drops, text comes back empty (not NULL)."""
    import time

    phrase = " ".join(f"p{i}" for i in range(50))
    big = " ".join([phrase] * 2000)           # 100_000 tokens
    # Doc 2's window at pos i is the phrase rotated by i mod 50; the
    # rotation-0 window loses to doc 1, rotations 1..49 first occur
    # at pos 1..49 (winners), and every pos >= 50 repeats an earlier
    # window (loser). Removal = union of LOSER spans [0,50) and
    # [50,100000) -> one merged [0,100000) interval: all tokens drop.
    docs = spark.createDataFrame(
        [(1, phrase + " unique trailing marker words"),
         (2, big)],
        "doc_id long, text string")
    t0 = time.monotonic()
    out = {r.doc_id: (r.text, r.tokens_dropped)
           for r in dedup.exact_substring_dedup(
               docs, min_tokens=50).collect()}
    elapsed = time.monotonic() - t0
    assert out[1] == (phrase + " unique trailing marker words", 0)
    assert out[2] == ("", 100_000)
    assert elapsed < 120, f"long-doc dedup took {elapsed:.1f}s"
