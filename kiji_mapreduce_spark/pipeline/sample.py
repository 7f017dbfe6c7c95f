"""Deterministic sampling and mixture weighting for training-data
pipelines.

Data mixing for pretraining needs *reproducible* subsets: the same
corpus + seed must select the same rows on any cluster, any partition
layout, any engine. Random() can't do that; a keyed hash can. All three
ops here reduce to hash/aggregate built-ins — no shuffle beyond the
aggregates themselves, nothing driver-side.

- ``stratified_sample``  — per-stratum Bernoulli by key hash: keep a row
  iff h(seed|key) mod 10000 < rate*10000. Filter only — no shuffle; at
  100 TB this is a map-side pass that Catalyst folds into the scan.
- ``stratum_topk``       — the k smallest key hashes per stratum: a
  deterministic "reservoir" (exactly k rows per stratum, stable under
  re-runs and re-partitioning). One shuffle on the stratum.
- ``mixture_weights``    — per-source token totals and the sampling
  weight that reshapes the corpus toward a target mixture (uniform by
  default), normalized so the largest weight is 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kiji_mapreduce_spark.functions import salted_topk
from kiji_mapreduce_spark.pipeline.dedup import token_hash64
from kiji_mapreduce_spark.pipeline.text import token_count

_BUCKETS = 10000


def _key_unit(key_col: str, seed: int, hash_fn: str) -> "F.Column":
    """Hash of (seed | key) folded to [0, 10000) — the sampling unit.
    Keys should be string/int typed; the string rendering crosses
    engines exactly for those (not for bool/float).

    A NULL key yields a NULL unit, so threshold filters DROP the row
    and rank windows sort it last — matching the SQL oracles'
    NULL-propagating ``||``. The previous concat_ws form skipped the
    NULL and hashed just the seed, collapsing every NULL-key row into
    ONE correlated sampling unit: at rate 0.5 a corpus's NULL-id rows
    were kept 50/50 or dropped 50/50 together (r13 review finding,
    confirmed empirically; weighted_sample_topk had the same fix in
    r5 but it never reached this helper's four consumers)."""
    packed = F.concat(F.lit(str(seed) + "|"),
                      F.col(key_col).cast("string"))
    # xxhash64 SKIPS null inputs (hash-of-nothing constant), so the
    # NULL must be made explicit rather than trusted to propagate
    return F.when(F.col(key_col).isNotNull(),
                  F.pmod(token_hash64(packed, hash_fn),
                         F.lit(_BUCKETS)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xx",
) -> DataFrame:
    """Keep each row iff its key hash lands under its stratum's rate.

    Deterministic in the key alone — membership survives re-partitioning,
    engine changes (``hash_fn="md5"``), and incremental re-runs, which is
    what makes the sample auditable. Per-stratum thresholds are exact
    integer bucket counts (round(rate * 10000), the split_thresholds
    rounding — int() truncation turned 0.57 into threshold 5699 via
    float representation error, r13 review finding, confirmed), so a
    rate of 0.35 keeps exactly the keys hashing below 3500. NULL-key
    rows have no sampling unit and are dropped (see ``_key_unit``).
    """
    u = _key_unit(key_col, seed, hash_fn)
    thresh = F.lit(int(round(default_rate * _BUCKETS)))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(round(rate * _BUCKETS)))).otherwise(thresh)
    return df.filter(u < thresh)


def cluster_balanced_sample(
    df: DataFrame,
    assign_df: DataFrame,
    target_per_cluster: int,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    seed: int = 42,
    hash_fn: str = "xx",
) -> DataFrame:
    """Downsample over-represented clusters toward a uniform cluster
    mixture: per-cluster keep rate = min(1, target/size), applied as a
    keyed-hash Bernoulli (same integer-bucket discipline as
    ``stratified_sample``, so membership is deterministic in the id and
    exact across engines). ``assign_df`` is (id, cluster) — e.g.
    ``cluster.kmeans_assign`` output. Thresholds use pure integer
    arithmetic (floor((target*10000)/size)), never a float rate.

    Shape at scale: cluster sizes are a tiny aggregate (k rows,
    broadcast); the corpus takes one equi-join on id and a filter — no
    extra shuffle beyond the assignment join.
    """
    sizes = assign_df.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("_sz"))
    thr = F.least(
        F.lit(_BUCKETS),
        F.floor(F.lit(target_per_cluster * _BUCKETS) / F.col("_sz"))
    ).cast("long")
    u = _key_unit(id_col, seed, hash_fn)
    return (df.join(assign_df, on=id_col)
            .join(F.broadcast(sizes), on=cluster_col)
            .filter(u < thr)
            .drop("_sz"))


def stratum_topk(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xx",
) -> DataFrame:
    """Exactly k rows per stratum: the k smallest key hashes, key as
    tiebreak — a deterministic reservoir sample. Adds ``sample_rank``
    (1..k). One shuffle on the stratum column.

    NULL-key rows are dropped — they have no sampling unit (the
    ``stratified_sample``/``split_assign`` contract). Nulls-last
    ordering alone left them eligible for underfull strata, where
    their complete order tie made WHICH ones survived
    partition-order-dependent (r13 review finding)."""
    u = _key_unit(key_col, seed, hash_fn)
    w = Window.partitionBy(strata_col).orderBy(
        u.asc(), F.col(key_col).asc())
    return (df.filter(F.col(key_col).isNotNull())
            .withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k))


def pack_documents(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    n_shards: int = 1,
    seed: int = 42,
    hash_fn: str = "xx",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (sequence packing
    for pretraining batches).

    Within each (group, shard), documents are ordered by key hash (a
    deterministic shuffle) and concatenated into one token stream;
    ``pack_id = floor(running_tokens_before / budget)`` and
    ``pack_offset`` locate each document's start in that stream — the
    concat-then-chunk packing used for pretraining sequence batches
    (documents may straddle a pack boundary, exactly as the token
    stream does).

    Scale shape: one window per (group, shard). Sharding exists because
    a per-group window is one task — 20 sources over 100 TB would give
    20 straggler tasks; ``n_shards`` splits each group into independent
    hash shards packed in parallel (packs never span shards, which
    costs at most one partially-filled pack per shard).
    """
    if budget < 1:
        raise ValueError(f"pack budget must be >= 1, got {budget}")
    if n_shards < 1:
        # floor(x/0)/pmod(x,0) are silent NULLs with ANSI off — every
        # pack assignment would be NULL (r13 review finding; the
        # chunk_documents guard discipline)
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    u = _key_unit(key_col, seed, hash_fn)
    shard = F.pmod(token_hash64(
        F.concat_ws("|", F.lit(f"shard{seed}"),
                    F.col(key_col).cast("string")), hash_fn),
        F.lit(n_shards))
    # NULL-text docs contribute 0 tokens (token_count(NULL) is NULL,
    # which reported n_tokens NULL instead of a packable zero-length
    # doc); NULL-key rows are dropped — they have no sampling unit,
    # so their pack_id/pack_offset were partition-order-dependent
    # (r13 review finding, the stratified_sample/split_assign
    # contract)
    toks = F.coalesce(token_count(F.col(text_col)), F.lit(0))
    base = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col), F.col(group_col), shard.alias("_shard"),
        toks.alias("n_tokens"), u.alias("_u"))
    w = (Window.partitionBy(group_col, "_shard")
         .orderBy("_u", key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        key_col, group_col, "n_tokens",
        F.col("_shard").alias("shard"),
        F.floor(before / budget).alias("pack_id"),
        F.pmod(before, F.lit(budget)).alias("pack_offset"))


def split_assign(
    df: DataFrame,
    splits: dict[str, float] | list[tuple[str, float]] | None = None,
    key_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xx",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash.

    Every training pipeline needs a held-out split that is a pure
    function of the example's identity — never of partition order or a
    sampler's RNG state — so that re-runs, engine changes, and
    incremental appends keep every document on the SAME side of the
    train/eval boundary (the alternative silently leaks eval data into
    training over time). Same integer-bucket discipline as
    ``stratified_sample``: u = h(seed|key) mod 10000, split intervals
    are exact cumulative bucket counts, the LAST split absorbs the
    rounding remainder so every row is assigned.

    ``splits`` preserves the given order (dict insertion order counts);
    default 80/10/10 train/val/test. Fractions must be positive and sum
    to 1 (±1 bucket of rounding). Pure projection — no shuffle; at
    100 TB this folds into the scan.
    """
    # the sampling unit lives in its OWN hash domain ("split|seed|key",
    # vs the samplers' "seed|key"): stratified_sample with the same
    # seed keeps rows with u < rate·10000, so an unsalted split over
    # its survivors would threshold the SAME u — every survivor lands
    # in the first split and the held-out sets are silently empty
    # (review finding, reproduced)
    packed = F.concat(F.lit(f"split|{seed}|"),
                      F.col(key_col).cast("string"))
    u = F.pmod(token_hash64(packed, hash_fn), F.lit(_BUCKETS))
    bounds = split_thresholds(splits)
    cum, col = 0, None
    for name, cum in bounds[:-1]:
        col = F.when(u < cum, name) if col is None else col.when(u < cum, name)
    col = col.otherwise(bounds[-1][0])
    # a NULL key has no hash and belongs to NO split: the CASE's
    # otherwise() would silently dump every NULL-key row into the LAST
    # split (and the NULL-skipping concat_ws before it put them all in
    # ONE correlated bucket — r13 review finding, the _key_unit fix)
    col = F.when(F.col(key_col).isNotNull(), col)
    return df.withColumn(out_col, col)


def split_thresholds(
    splits: dict[str, float] | list[tuple[str, float]] | None = None,
) -> list[tuple[str, int]]:
    """The validated (name, cumulative-bucket) boundaries
    ``split_assign`` uses — exposed so SQL oracles / external systems
    can reproduce the exact CASE expression. Shares ``split_assign``'s
    validation (it is the single source of the boundaries), including
    the bucket-collapse check: a fraction that rounds to ZERO buckets
    would make that split silently empty — the exact integrity failure
    this op exists to prevent — so it raises instead."""
    items = list(splits.items()) if isinstance(splits, dict) \
        else list(splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    if len(items) < 2:
        raise ValueError("need at least two splits")
    if len({name for name, _ in items}) < len(items):
        # 'train=0.5,train=0.5' would validate (sums to 1) yet assign
        # every row to the first threshold — the later duplicate is a
        # silently-empty split, the exact failure this op guards against
        dupes = sorted({n for n, _ in items
                        if sum(1 for m, _ in items if m == n) > 1})
        raise ValueError(f"duplicate split name(s): {', '.join(dupes)}")
    if any(frac <= 0 for _, frac in items):
        raise ValueError("split fractions must be positive")
    if abs(sum(frac for _, frac in items) - 1.0) > 1.0 / _BUCKETS:
        raise ValueError("split fractions must sum to 1")
    out, cum = [], 0
    for name, frac in items[:-1]:
        nxt = cum + int(round(frac * _BUCKETS))
        if nxt == cum:
            raise ValueError(
                f"split {name!r} fraction {frac} rounds to zero of the "
                f"{_BUCKETS} hash buckets — it would be silently empty")
        out.append((name, nxt))
        cum = nxt
    if cum >= _BUCKETS:
        raise ValueError(
            f"split {items[-1][0]!r} is left zero of the {_BUCKETS} "
            "hash buckets by the preceding fractions — it would be "
            "silently empty")
    out.append((items[-1][0], _BUCKETS))
    return out


def weighted_sample_topk(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per stratum, with
    inclusion probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis reservoir, expressed as exponential clocks: each
    row draws clock = -ln(u)/w from its deterministic unit hash u, and
    the k SMALLEST clocks win (a weight-w item's clock is an
    exponential with rate w, so heavier items finish sooner).

    Deterministic and engine-reproducible: u is the full-precision
    60-bit md5 hash of (seed|key) mapped to (0, 1], never ``rand()`` —
    the same corpus + seed selects the same rows on any cluster,
    partition layout, or engine. The k-minimum selection reuses the
    skew-safe salted top-k, so a hot stratum never lands in one task.

    Returns the winning rows with their ``rank`` (1 = smallest clock).
    Weights must be strictly positive and keys non-NULL; rows failing
    either are excluded (zero inclusion probability — and a NULL key
    would hash as the bare seed in Spark's NULL-skipping concat_ws while
    the SQL oracle's ``||`` nulls the whole clock, so the engines would
    disagree about it; r5 review).
    """
    packed = F.concat_ws("|", F.lit(str(seed)),
                         F.col(key_col).cast("string"))
    h = token_hash64(packed, "md5")
    u = (h + 1) / F.lit(float(1 << 60))  # (0, 1] — ln(0) guarded
    clock = -F.log(u) / F.col(weight_col)
    flt = (df.filter((F.col(weight_col) > 0)
                     & F.col(key_col).isNotNull())
           .withColumn("_clock", clock))
    return (salted_topk(flt, strata_col, "_clock", k=k, ascending=True,
                        tiebreak_cols=[key_col])
            .drop("_clock"))


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    target: dict[str, float] | None = None,
    temperature: float | None = None,
) -> DataFrame:
    """Per-group token totals and mixture sampling weights.

    ``token_share`` is the group's fraction of corpus tokens;
    ``sample_weight`` is (target share / token share) scaled so the
    largest weight is 1 — i.e. the per-group keep probability that
    reshapes the corpus toward the target mixture without upsampling
    any group. The target is, in precedence order:

    - ``target``: explicit per-group shares;
    - ``temperature``: ``share^(1/T)`` renormalized — the standard
      multilingual rebalancing knob (T=1 keeps the natural mixture,
      T->inf approaches uniform, T<1 sharpens toward the head);
    - neither: uniform across observed groups.

    Shape: one grouped aggregate (map-side partial sums), then window
    functions over the tiny per-group result — group counts are small
    (sources, languages), so the single-partition window is safe.
    """
    if target is not None and temperature is not None:
        raise ValueError("pass target or temperature, not both")
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"))
    if target is not None:
        # pin the (tiny, group-count-sized) aggregate before the
        # validation collect: without it the full corpus token-count
        # scan re-executes when the caller acts on the result
        # (r13 review finding)
        per = per.localCheckpoint(eager=True)
        # validate the explicit mapping against the OBSERVED groups: a
        # typo'd name silently weighted the real group 0 (rate-based
        # sampling then deletes the whole source), and a fully
        # unmatched target made every sample_weight NULL via 0/0 (r13
        # review finding — the temperature knob was validated, this
        # one was not)
        observed = {r[0] for r in per.select(group_col).collect()}
        missing = sorted(set(target) - observed)
        if missing:
            raise ValueError(
                f"mixture target names group(s) not in the corpus: "
                f"{', '.join(map(str, missing))} (observed: "
                f"{', '.join(map(str, sorted(observed)))})")
        unweighted = sorted(observed - set(target))
        if unweighted:
            raise ValueError(
                "mixture target gives no share to observed group(s) "
                f"{', '.join(map(str, unweighted))} — make the drop "
                "explicit with a 0.0 entry")
    w_all = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w_all)
    if temperature is not None:
        if temperature <= 0:
            raise ValueError("temperature must be positive")
        powed = F.pow(share, F.lit(1.0 / temperature))
        tgt = powed / F.sum(powed).over(w_all)
    elif target is None:
        tgt = F.lit(1.0) / F.count(F.lit(1)).over(w_all)
    else:
        tgt = F.lit(0.0)
        for value, t in sorted(target.items()):
            tgt = F.when(F.col(group_col) == value, F.lit(t)).otherwise(tgt)
    raw = tgt / share
    norm = raw / F.max(raw).over(w_all)
    return per.select(
        group_col, "n_docs", "n_tokens",
        F.round(share, 4).alias("token_share"),
        F.round(norm, 4).alias("sample_weight"))
