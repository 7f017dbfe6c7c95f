"""BPE tokenizer induction (Sennrich et al. 2016): the merge loop vs
an independent hand/reference computation, determinism across
partitionings, the encoder's greedy rank application, and the
corpus-scale token-count UDF."""

import pytest

from kiji_mapreduce_spark.pipeline import bpe


def _ref_learn(word_counts, vocab_size, min_pair_count=2):
    """Independent reference: the verbatim textbook formulation with
    collections.Counter (different code path from learn_merges'
    hand-rolled dict loop)."""
    from collections import Counter

    words = {tuple(w) + ("</w>",): n for w, n in word_counts}
    merges = []
    for _ in range(vocab_size):
        pairs = Counter()
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        new = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        words = new
    return merges


def test_learn_merges_matches_reference():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("lowest", 1)]
    got = bpe.learn_merges(wc, vocab_size=12, min_pair_count=2)
    want = _ref_learn(wc, vocab_size=12)
    assert got == want
    # the Sennrich running example's signature merge appears:
    # 'est'+'</w>' forms from the newest/widest/lowest family
    joined = [a + b for a, b in got]
    assert "est</w>" in joined or "est" in joined


def test_learn_merges_deterministic_tie_break():
    # (a,b) and (c,d) both count 2 (as do the </w> pairs): the
    # lexicographic pair tie-break picks (a,b) every time
    wc = [("ab", 2), ("cd", 2)]
    got = bpe.learn_merges(wc, vocab_size=1, min_pair_count=2)
    assert got == [("a", "b")]


def test_encode_word_greedy_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
              ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("lowest", ranks) == ["low", "est</w>"]
    assert bpe.encode_word("best", ranks) == ["b", "est</w>"]
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_bpe_train_and_count_on_spark(spark):
    docs = spark.createDataFrame(
        [(i, "the newest widget is the lowest cost newest item")
         for i in range(20)]
        + [(100 + i, "widest margins on the newest lowest widgets")
           for i in range(10)],
        "doc_id long, text string")
    merges = bpe.bpe_train(docs, vocab_size=30, max_words=1000)
    assert 0 < len(merges) <= 30
    # determinism across partitionings: repartitioned corpus learns
    # the identical merge list
    again = bpe.bpe_train(docs.repartition(7), vocab_size=30,
                          max_words=1000)
    assert merges == again

    counts = {r.doc_id: r.n_bpe_tokens
              for r in bpe.bpe_token_counts(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    want = sum(len(bpe.encode_word(w, ranks)) for w in
               "the newest widget is the lowest cost newest item"
               .split())
    assert counts[0] == want
    assert all(v > 0 for v in counts.values())

    tbl = bpe.merges_table(spark, merges)
    rows = sorted((r.rank, r.left, r.right) for r in tbl.collect())
    assert rows == [(i, a, b) for i, (a, b) in enumerate(merges)]


def test_word_frequencies_cap_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "b b a a c")], "doc_id long, text string")
    top2 = {r.word for r in
            bpe.word_frequencies(docs, max_words=2).collect()}
    # a and b both count 2; the word tie-break keeps {a, b}, drops c
    assert top2 == {"a", "b"}


def test_bpe_token_counts_null_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens
           for r in bpe.bpe_token_counts(docs, [("a", "b")]).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_cli_bpe_train(spark, tmp_path, capsys):
    """kiji-mr bpe-train end to end: merge table parquet out, optional
    per-doc token counts, stats JSON, loud missing-column error."""
    import json as _json

    import pytest as _pytest

    from kiji_mapreduce_spark import cli

    docs = spark.createDataFrame(
        [(i, "the newest lowest widget in the newest line")
         for i in range(8)],
        "doc_id long, text string")
    docs.write.parquet(f"{tmp_path}/docs")

    rc = cli.main(["bpe-train", "--input", f"{tmp_path}/docs",
                   "--output", f"{tmp_path}/merges",
                   "--vocab-size", "20",
                   "--token-counts", f"{tmp_path}/counts"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < stats["n_merges"] <= 20
    assert stats["n_tokens_total"] > 0
    tbl = spark.read.parquet(f"{tmp_path}/merges")
    assert set(tbl.columns) == {"rank", "left", "right"}
    assert tbl.count() == stats["n_merges"]
    counts = spark.read.parquet(f"{tmp_path}/counts")
    assert counts.count() == 8

    with _pytest.raises(SystemExit):
        cli.main(["bpe-train", "--input", f"{tmp_path}/docs",
                  "--output", f"{tmp_path}/m2",
                  "--text-col", "nope"])
