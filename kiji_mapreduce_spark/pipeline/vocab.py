"""BPE tokenizer induction over a distributed corpus.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — public algorithm): start from
characters, repeatedly merge the most frequent adjacent symbol pair.
The reference engine has nothing like it; a training-data pipeline needs
it to build the tokenizer it then counts/packs tokens with.

Scale shape — the part worth getting right at 100 TB:

- The ONLY corpus-sized work is the initial word count (one shuffle with
  map-side partial agg, the word-count plan). Everything after runs on
  the DISTINCT-word table, which is vocabulary-sized (Heaps' law:
  sublinear in corpus size) and carries each word's corpus frequency as
  a weight — exactly how single-node BPE trainers avoid re-scanning the
  corpus, except here the word table itself stays distributed.
- Each merge round is one explode+agg over that small table for pair
  counts, a 1-row argmax collect, and one codegen'd array fold to apply
  the merge. The table is ``localCheckpoint``ed every few rounds so the
  plan doesn't deepen with the merge count.
- Applying a trained tokenizer to new text (``bpe_token_count``) again
  dictionary-encodes first: segmentation runs per DISTINCT word in an
  Arrow batch, then a broadcast join maps words back onto documents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from kiji_mapreduce_spark.pipeline.bpe import END, encode_word
from kiji_mapreduce_spark.pipeline.dedup import tokens


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (df.filter(F.col(text_col).isNotNull())
            .select(F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _initial_symbols(words: DataFrame) -> DataFrame:
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    return words.select("word", "cnt", syms.alias("syms"))


def _pair_counts(symtab: DataFrame) -> DataFrame:
    idx = F.sequence(F.lit(0), F.size("syms") - 2)
    pairs = F.transform(
        idx, lambda i: F.struct(
            F.get("syms", i).alias("a"), F.get("syms", i + 1).alias("b")))
    return (symtab.filter(F.size("syms") >= 2)
            .select(F.explode(pairs).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_cnt")))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a||b,
    as one codegen'd fold: after a merge the accumulator's tail is the
    merged symbol, so an overlapping second 'b' cannot re-merge (the
    'aaa' case folds to ['aa', 'a'], matching the sequential reference
    implementation)."""
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) \
            & (s == F.lit(b))
        return F.when(
            can,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        syms, F.array().cast("array<string>"), step)


def _accept_batch(
    rows, taken_budget: int, min_pair_count: int, truncated: bool,
) -> list[tuple[str, str, int]]:
    """Greedy prefix of one round's sorted top-P pair list that is
    PROVABLY identical to taking them one recount at a time.

    After merging pair (a1, b1), only three things can outrank a later
    candidate c_i in the sequential algorithm: (1) c_i's own count
    changed — impossible when c_i shares no symbol with any accepted
    pair; (2) some old pair grew — counts only shrink under a merge;
    (3) a NEW pair involving the merged symbol appeared. New-pair counts
    are bounded by the OLD counts of pairs adjacent to the merged
    symbols (each "x a1b1" occurrence came from "x a1 b1"), and those
    adjacent pairs either sit BELOW c_i in this round's sorted list
    (anything above was accepted, hence disjoint) or fell outside the
    collected top-P (count <= the truncation floor). So c_i is safe iff
    it is disjoint from every accepted pair AND strictly beats both the
    floor and the first (= highest-count) remaining row that touches an
    accepted symbol. Stop at the first unsafe row — later rows face the
    same unknown and order among them is no longer provable.
    """
    floor = int(rows[-1].pair_cnt) if truncated else 0
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for i, r in enumerate(rows):
        cnt = int(r.pair_cnt)
        if cnt < min_pair_count or len(accepted) >= taken_budget:
            break
        if accepted:
            if r.a in used or r.b in used:
                break
            shared_max = floor
            for later in rows[i + 1:]:
                if later.a in used or later.b in used:
                    shared_max = max(shared_max, int(later.pair_cnt))
                    break  # sorted desc: the first hit is the max
            if cnt <= shared_max:
                break
        accepted.append((r.a, r.b, cnt))
        used.update((r.a, r.b))
    return accepted


def bpe_train(
    df: DataFrame, text_col: str = "text", num_merges: int = 100,
    min_pair_count: int = 2, checkpoint_every: int = 8,
    batch_pairs: int = 64, stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right,
    pair_count)] in merge order — the tokenizer model. Stops early when
    no pair reaches ``min_pair_count`` (merging frequency-1 pairs only
    memorizes the corpus). Ties break deterministically on
    (count desc, left, right), so the learned model is reproducible
    across partitionings and engines.

    Rounds are BATCHED: each pair-count job collects the top
    ``batch_pairs`` candidates and accepts the longest prefix that
    ``_accept_batch`` proves order-equivalent to one-merge-per-recount
    (symbol-disjoint, strictly above every count an earlier accepted
    merge could have created). A 32k-vocab train is then latency-bound
    by the number of PROOF-LIMITED rounds, not 32k sequential jobs —
    in the long Zipf tail most rounds accept many disjoint pairs. Pass
    ``stats={}`` to get the round count back (``stats['rounds']``).
    Worst case (every top pair chained on a shared symbol) degrades to
    one merge per round — the price of exactness.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    if batch_pairs < 1:
        raise ValueError("batch_pairs must be >= 1")
    symtab = _initial_symbols(_word_counts(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    applied_since_ckpt = 0
    while len(merges) < num_merges:
        rows = (_pair_counts(symtab)
                .orderBy(F.col("pair_cnt").desc(), "a", "b")
                .limit(batch_pairs).collect())
        rounds += 1
        if not rows or rows[0].pair_cnt < min_pair_count:
            break
        batch = _accept_batch(rows, num_merges - len(merges),
                              min_pair_count,
                              truncated=len(rows) == batch_pairs)
        merges.extend(batch)
        for a, b, _ in batch:
            symtab = symtab.select(
                "word", "cnt",
                _apply_merge(F.col("syms"), a, b).alias("syms"))
            # truncate lineage INSIDE the apply loop: fold expressions
            # nest one level per un-checkpointed merge, and a full
            # batch (batch_pairs merges) in one plan would defeat the
            # nesting bound the checkpoint exists for (review finding)
            applied_since_ckpt += 1
            if applied_since_ckpt >= checkpoint_every:
                symtab = symtab.localCheckpoint()
                applied_since_ckpt = 0
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def bpe_vocab(
    df: DataFrame, text_col: str = "text",
    merges: list[tuple[str, str, int]] | None = None,
    checkpoint_every: int = 8, **train_kw,
) -> DataFrame:
    """Subword vocabulary with corpus frequencies under a merge list
    (trained here if not given) -> (subword, n_words, total_cnt)."""
    if merges is None:
        merges = bpe_train(df, text_col, **train_kw)
    symtab = _initial_symbols(_word_counts(df, text_col))
    for i, (a, b, _) in enumerate(merges):
        symtab = symtab.select(
            "word", "cnt", _apply_merge(F.col("syms"), a, b).alias("syms"))
        # same cadence as bpe_train: checkpoint to bound fold nesting,
        # not after every merge (each localCheckpoint is an eager job)
        if (i + 1) % checkpoint_every == 0:
            symtab = symtab.localCheckpoint()
    # carry the word through the explode: n_words is the number of
    # DISTINCT words containing the subword (a word using it twice —
    # 'aa' in 'aaaa' — counts once; F.count over exploded positions
    # double-counted it, r5 advice), total_cnt keeps multiplicity
    return (symtab.select("word", F.explode("syms").alias("subword"),
                          "cnt")
            .groupBy("subword")
            .agg(F.countDistinct("word").alias("n_words"),
                 F.sum("cnt").alias("total_cnt")))


# greedy lowest-rank-first BPE segmentation: ONE implementation, shared
# with the bpe-train CLI encoder — two drifting copies is how the r13
# ASCII-whitespace parity fix would have silently missed one of them
_segment = encode_word


def _segment_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    return len(_segment(word, ranks))


def bpe_token_count(
    df: DataFrame, merges: list[tuple[str, str, int]],
    text_col: str = "text", out_col: str = "bpe_tokens",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Token count per row under a trained BPE model. Dictionary-encoded
    apply: segmentation (Python loop — unavoidable for rank-ordered
    merges) runs once per DISTINCT word via an Arrow batch, and a
    broadcast join of (word -> n_subtokens) prices each document as one
    codegen'd sum over its words — the corpus text is scanned, never
    segmented row-by-row."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def _seg(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_sub": [_segment_len(w, ranks) for w in pdf["word"]],
            })

    words = (df.filter(F.col(text_col).isNotNull())
             .select(F.explode(tokens(F.col(text_col))).alias("word"))
             .distinct())
    priced = words.mapInPandas(_seg, "word string, n_sub long")
    # regroup on declared id columns, not the full row — folding a wide
    # text column back through a shuffle key is the scale smell this
    # dictionary-encoding exists to avoid
    keys = id_cols if id_cols else [c for c in df.columns
                                    if c != text_col]
    if not keys:
        raise ValueError("bpe_token_count needs id_cols (or non-text "
                         "columns) to regroup documents by")
    exploded = df.select(
        *keys, F.explode_outer(tokens(F.col(text_col))).alias("_w"))
    joined = exploded.join(F.broadcast(priced),
                           exploded["_w"] == priced["word"], "left")
    return (joined.groupBy(*keys)
            .agg(F.coalesce(F.sum("n_sub"), F.lit(0)).alias(out_col)))


def bpe_segment(
    df: DataFrame, merges: list[tuple[str, str, int]],
    text_col: str = "text", out_col: str = "bpe_subwords",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Subword sequence per row under a trained BPE model -> (ids...,
    out_col: array<string>) — the encode step a training pipeline runs
    before token packing. Same dictionary-encoded shape as
    ``bpe_token_count``: the rank-ordered merge walk (Python,
    unavoidable) runs once per DISTINCT word in an Arrow batch, then a
    broadcast join prices each document's words and a position-ordered
    re-assembly flattens them back into one subword array per row —
    corpus text is scanned, never segmented row-by-row. Empty/NULL text
    yields an empty array."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def _seg(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "subs": [_segment(w, ranks) for w in pdf["word"]],
            })

    words = (df.filter(F.col(text_col).isNotNull())
             .select(F.explode(tokens(F.col(text_col))).alias("word"))
             .distinct())
    segged = words.mapInPandas(_seg, "word string, subs array<string>")
    keys = id_cols if id_cols else [c for c in df.columns
                                    if c != text_col]
    if not keys:
        raise ValueError("bpe_segment needs id_cols (or non-text "
                         "columns) to regroup documents by")
    exploded = df.select(
        *keys, F.posexplode_outer(tokens(F.col(text_col)))
        .alias("_pos", "_w"))
    joined = exploded.join(F.broadcast(segged),
                           exploded["_w"] == segged["word"], "left")
    # order-preserving re-assembly: collect (pos, subs) structs, sort by
    # word position, flatten — array_sort on the struct sorts by _pos
    assembled = (joined.groupBy(*keys)
                 .agg(F.array_sort(F.collect_list(
                     F.when(F.col("_pos").isNotNull(),
                            F.struct("_pos", "subs"))))
                      .alias("_parts")))
    return assembled.select(
        *keys,
        F.flatten(F.transform("_parts", lambda p: p["subs"]))
        .alias(out_col))
