"""Relational operators beyond both the reference and stock Spark.

The reference's join surface is equi-lookup only (SURVEY.md §2.4). Spark
adds shuffle equi-joins; this module adds the time-series joins a
training-data / event pipeline needs, built scale-first:

- ``asof_join``: for each left row, the most recent right row at-or-before
  its timestamp (per key). Implemented with the union-tag trick — one
  shuffle on (key), one sort, a last-non-null window — never a range
  cross-product, so it survives arbitrarily dense right sides.
- ``range_join_binned``: inequality join accelerated by binning, turning
  a cross-product range predicate into an equi-join on overlapping bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def local_table(spark, rows, schema: str) -> DataFrame:
    """A small driver-local table as a DataFrame, via the Arrow path.

    ``createDataFrame(list_of_tuples)`` ships the rows as a PICKLED RDD
    over ``defaultParallelism`` partitions, so every downstream action
    replays it through that many Python workers — measured ~10 s of
    task-time (0.5 s wall at local[32]) for a 10k-row model table,
    paid per action, the dominant cost of ``dsir_log_weights``'
    scoring job. Routing the same rows through a pandas DataFrame uses
    the session's Arrow conversion instead: the driver serializes one
    Arrow batch and the JVM plans a LocalTableScan — no Python workers
    at any action, ~0.45 s/action faster at 10k rows, identical
    values. Falls back to the classic path when the Arrow conversion
    can't take the rows (exotic nested types); ``schema`` is the same
    DDL string either way. Use for model/ratio/rule tables that are
    about to be broadcast, not as a data-ingest path."""
    if rows:
        try:
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame(list(rows)), schema=schema)
        except Exception:
            pass  # fall through to the row-based builder
    return spark.createDataFrame(rows, schema)


def lit_array_sql(values, kind: str) -> str | None:
    """The SQL text of a literal array, or ``None`` when the values are
    not expressible as SQL literals (non-finite doubles — SQL has no
    nan/inf literals). The text form exists so callers composing LARGER
    generated expressions (``similarity.random_hyperplane_buckets``'
    per-plane dot products, the simhash vote aggregates) can inline the
    array into one parsed string instead of paying a py4j round trip
    per fragment. ``kind`` is 'double' | 'int' | 'long' | 'string'."""
    import math

    vals = list(values)
    if not vals:
        raise ValueError("lit_array requires at least one element")
    if kind == "double":
        vals = [float(v) for v in vals]
        if not all(math.isfinite(v) for v in vals):
            return None
        body = ", ".join(f"{v!r}D" for v in vals)
    elif kind == "int":
        body = ", ".join(str(int(v)) for v in vals)
    elif kind == "long":
        body = ", ".join(f"{int(v)}L" for v in vals)
    elif kind == "string":
        body = ", ".join(
            "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"
            for v in vals)
    else:
        raise ValueError(f"unsupported lit_array kind: {kind!r}")
    return f"array({body})"


def lit_array(values, kind: str) -> Column:
    """A literal array column from ONE generated SQL expression.

    ``F.array(*[F.lit(v) ...])`` costs a py4j round trip per element
    (a 64-dim hyperplane = ~70 driver round trips, ~0.5 ms each, paid
    on every query construction), and ``F.lit(list)`` is documented
    sugar for exactly that loop. Embedding the values in one parsed
    ``array(...)`` string is a single round trip and yields a FOLDABLE
    literal. Doubles are emitted as ``repr(v)D`` — Python repr is the
    shortest exact round-trip decimal and Java's parseDouble is
    correctly rounded, so every IEEE double (verified incl. denormals
    and DBL_MAX) reproduces bit-exactly; non-finite values fall back
    to the per-element form (SQL has no nan/inf literals). ``kind`` is
    'double' | 'int' | 'long' | 'string'."""
    # listify ONCE before both uses: lit_array_sql consumes its input
    # via list(values), so a generator argument would arrive exhausted
    # at the non-finite fallback and silently yield an empty array
    # (ADVICE r14)
    vals = list(values)
    text = lit_array_sql(vals, kind)
    if text is None:
        return F.array(*[F.lit(float(v)) for v in vals])
    return F.expr(text)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """As-of join: attach to each left row the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) for the same key.

    Scale shape: union the two sides with a tag, one shuffle by key, one
    window pass carrying the last-seen right ROW forward as a single
    struct — so every filled column comes from the same matched right
    row (ASOF semantics: the match is a row, not per-column), and a
    right row's NULL value correctly overrides an older non-null one.
    No range explosion; right rows with equal timestamps resolve to the
    last one in (ts, value-struct) order (deterministic).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts]

    # tag: right rows sort before left rows at equal ts unless strict,
    # so <= vs < is just the tag ordering
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0 if not strict else 2).alias("_tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    ).filter(F.col("_ts").isNotNull())
    # a NULL-ts right row has no event time and can match nothing —
    # unfiltered it sorts NULLS FIRST (before every real timestamp)
    # and fabricates an as-of match for left rows with no real prior
    # right row (r13 review finding; DuckDB ASOF and pandas merge_asof
    # exclude/reject NULL ts too). NULL-ts LEFT rows need no guard:
    # they sort before every right row, find no match, and emit NULL
    # value columns — the same verdict those engines give.
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(dict(r.dtypes)["_r"]).alias("_r"),
    )
    unioned = l.unionByName(
        r.select(*keys, "_ts", "_tag", "_r"), allowMissingColumns=True)
    w = (Window.partitionBy(*keys)
         .orderBy("_ts", "_tag", "_r")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_m"))
    out = filled.filter(F.col("_tag") == 1)
    for c in value_cols:
        out = out.withColumn(c if c not in left.columns else f"{c}_right",
                             F.col("_m")[c])
    return out.drop("_ts", "_tag", "_r", "_m")


def salted_topk(
    df: DataFrame, key_cols: list[str] | str, order_col: str, k: int,
    n_salts: int = 16, ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k per key, skew-safe: two-phase window.

    A plain ``Window.partitionBy(key)`` puts every row of a hot key into
    one task. Phase 1 splits each key into ``n_salts`` deterministic
    sub-partitions (hash-salted) and takes a local top-k; phase 2 ranks
    the ≤ n_salts*k survivors per key. The hot key's row count per task
    drops by n_salts; correctness is unaffected because any global top-k
    row is necessarily in its salt's local top-k.

    Tie-break is (order_col, tiebreak_cols...) so results are
    deterministic.

    ``salt_cols`` limits the salt hash to the named columns (they must
    vary within a key, or the hot key still lands in one sub-partition).
    Default hashes the whole row — correct for any schema, but
    per-row-expensive when rows carry wide arrays (the ANN candidate
    stages pass their unique neighbor id instead). Any row->salt
    assignment yields the same final top-k, so this knob never moves
    results.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tiebreak = tiebreak_cols or []
    order = ([F.col(order_col).asc()] if ascending
             else [F.col(order_col).desc()])
    order += [F.col(c) for c in tiebreak]
    if salt_cols is None:
        # default salt = every NON-MAP column: F.hash raises
        # HASH_MAP_TYPE on MapType input (Spark forbids hashing maps —
        # iteration order is undefined), and this repo's own readers
        # produce map columns (webdataset samples, map families). An
        # all-map frame degrades to one sub-partition per key (still
        # correct — phase 2 ranks the same survivors — just not
        # skew-split; pass salt_cols to restore that).
        salt_cols = [c for c, t in df.dtypes if not t.startswith("map<")]
    salt = (F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
            if salt_cols else F.lit(0))
    local_w = Window.partitionBy(*keys, "_salt").orderBy(*order)
    final_w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_lrank", F.row_number().over(local_w))
        .filter(F.col("_lrank") <= k)
        .withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= k)
        .drop("_salt", "_lrank")
    )


def range_join_binned(
    left: DataFrame, right: DataFrame,
    left_point: str, right_lo: str, right_hi: str,
    bin_width: int, extra_on: list[str] | None = None,
) -> DataFrame:
    """Join left points into right [lo, hi) ranges via bin equi-join.

    Each range explodes into ceil((hi-lo)/bin_width)+1 bin rows; points
    map to one bin — the join is an equi-join on (bin, extra_on) followed
    by the exact range predicate. Keeps Catalyst in hash-join land instead
    of BroadcastNestedLoop for big-big range joins.
    """
    extra_on = extra_on or []
    lo_bin = (F.col(right_lo) / bin_width).cast("long")
    hi_bin = (F.col(right_hi) / bin_width).cast("long")
    r = right.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    l = left.withColumn("_bin", (F.col(left_point) / bin_width).cast("long"))
    joined = l.join(r, on=["_bin", *extra_on]).filter(
        (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) < F.col(right_hi)))
    return joined.drop("_bin")


def gapfill_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Regularize a sparse time series onto a dense per-key grid with
    last-observation-carried-forward fill (the resample/gap-fill step a
    feature or metrics pipeline runs before model joins; TimescaleDB
    calls this time_bucket_gapfill + locf).

    The grid spans each key's own [min, max] bucket range — built with
    ``sequence`` + ``explode``, so the spine is generated distributed,
    sized per key, and never materializes a global calendar cross-join.
    One shuffle (the per-key agg); the spine join is co-partitioned by
    key, and the fill is a single running ``last(ignorenulls)`` window.

    Returns (key_cols..., bucket, value_filled, observed). Buckets with
    no prior observation (leading gaps) stay null.
    """
    n, unit = step.split()
    if n != "1":
        raise ValueError("gapfill_locf steps are calendar units: '1 day', "
                         "'1 hour', ... (got %r)" % step)
    bucket = F.date_trunc(unit.rstrip("s"), F.col(ts_col))
    observed = (df
                .withColumn("_bucket", bucket)
                .groupBy(*key_cols, "_bucket")
                .agg(F.max_by(F.col(value_col), F.col(ts_col)).alias("_v")))
    spine = (observed
             .groupBy(*key_cols)
             .agg(F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi"))
             .select(*key_cols,
                     F.explode(F.sequence(
                         "_lo", "_hi",
                         F.expr(f"interval {step}"))).alias("_bucket")))
    w = (Window.partitionBy(*key_cols).orderBy("_bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine
            .join(observed, on=[*key_cols, "_bucket"], how="left")
            .select(*key_cols,
                    F.col("_bucket").alias("bucket"),
                    F.last("_v", ignorenulls=True).over(w)
                    .alias("value_filled"),
                    F.col("_v").isNotNull().alias("observed")))


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots (the CDC primitive:
    validate a migration, audit an incremental load, or emit a change
    feed from periodic full snapshots).

    One full outer join on the key; change detection hashes the
    compared columns JVM-side (xxhash64 over the column structs — no
    per-column comparison explosion for wide tables, no Python). Each
    output row carries ``change`` in {inserted, deleted, updated}
    plus the key; unchanged rows are dropped as early as possible so
    only actual changes survive the join stage.
    """
    compare_cols = compare_cols or [
        c for c in before.columns if c in set(after.columns)
        and c not in set(key_cols)]
    # hash the JSON rendering with EXPLICIT nulls, not the raw columns:
    # xxhash64 skips null children entirely, so ('x', NULL) and
    # (NULL, 'x') hashed identically and a value moving between columns
    # across a NULL read as "unchanged" (r5 review finding)
    row_repr = F.to_json(
        F.struct(*[F.col(c) for c in compare_cols]),
        {"ignoreNullFields": "false"})
    # NULL-SAFE key equality: a plain USING join can never match NULL
    # keys, so an unchanged row with a NULL key component came back as
    # a spurious deleted+inserted pair (r13 review finding). eqNullSafe
    # keeps the same hash-join plan; the output key is the coalesce of
    # the two sides (identical where both matched). Each side's keys
    # are RENAMED before the join — before/after are routinely the
    # same lineage (a table vs its own later snapshot), and dataset
    # column references would be ambiguous on a self-join.
    bh = before.select(
        *[F.col(k).alias(f"_bk_{k}") for k in key_cols],
        F.xxhash64(row_repr).alias("_bhash"))
    ah = after.select(
        *[F.col(k).alias(f"_ak_{k}") for k in key_cols],
        F.xxhash64(row_repr).alias("_ahash"))
    cond = None
    for kc in key_cols:
        c = F.col(f"_bk_{kc}").eqNullSafe(F.col(f"_ak_{kc}"))
        cond = c if cond is None else (cond & c)
    j = bh.join(ah, cond, "full_outer")
    change = (F.when(F.col("_bhash").isNull(), F.lit("inserted"))
              .when(F.col("_ahash").isNull(), F.lit("deleted"))
              .when(F.col("_bhash") != F.col("_ahash"), F.lit("updated")))
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*[F.coalesce(F.col(f"_bk_{kc}"), F.col(f"_ak_{kc}"))
                      .alias(kc) for kc in key_cols], "change"))


def bin_index(value_col: str, lo: float, hi: float, bins: int) -> Column:
    """Clamped fixed-width histogram bin index for ``value_col`` over
    ``[lo, hi]`` — THE shared bin arithmetic: ``histogram_quantiles``,
    ``audit.distribution_drift`` and ``streaming.jobs.stream_drift``
    all call this one builder, so the documented stream-vs-batch PSI
    parity ("same bin clamping") can never drift between hand copies
    (r13 review finding: three identical inlined instances).

    Clamps in DOUBLE space BEFORE the int cast: an outlier far outside
    a caller-supplied [lo, hi] otherwise overflows the cast (ANSI mode
    aborts the job; non-ANSI wraps it into bin 0 — reproduced)."""
    width = (hi - lo) / bins
    v = F.least(F.lit(float(hi)), F.greatest(
        F.lit(float(lo)), F.col(value_col).cast("double")))
    return F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((v - lo) / width).cast("int")))


def histogram_quantiles(
    df: DataFrame, value_col: str, probs: list[float], bins: int = 1000,
    group_col: str | None = None, lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Scalable approximate quantiles via fixed-width histogram binning.

    Exact percentiles (``F.percentile``) shuffle every value to its
    group's reducer — at 100 TB that is the sort bottleneck. The
    histogram path is two narrow passes: (1) global min/max (skipped if
    ``lo``/``hi`` are given), (2) one partial-aggregated count per
    (group, bin) — at most ``bins`` rows per group ever shuffle. The
    estimate for probability p is the upper edge of the first bin whose
    cumulative count reaches p — deterministic (no interpolation between
    engine float orders), with error bounded by (hi-lo)/bins.

    Returns (group?,) + one row per prob: (prob, quantile_est, n).
    """
    import math

    if not probs or any(not (0.0 < p <= 1.0) for p in probs):
        raise ValueError("probs must be in (0, 1]")
    if bins < 1:
        raise ValueError("bins must be >= 1")
    for name, bound in (("lo", lo), ("hi", hi)):
        if bound is not None and not math.isfinite(bound):
            raise ValueError(f"histogram_quantiles: {name} must be "
                             f"finite, got {bound}")
    # NaN is not NULL: one NaN value would win F.max (Spark sorts NaN
    # greatest), survive the hi<=lo guard (NaN comparisons are false),
    # and poison width/every quantile_est into silent NaN (r13 review
    # finding). NaNs carry no order information — exclude them from
    # both the range derivation and the counts, like NULLs.
    cast_v = F.col(value_col).cast("double")
    vals = df.filter(F.col(value_col).isNotNull() & ~F.isnan(cast_v))
    if lo is None or hi is None:
        r = vals.agg(F.min(F.col(value_col).cast("double")),
                     F.max(F.col(value_col).cast("double"))).first()
        if r[0] is None or r[1] is None:
            raise ValueError(
                "histogram_quantiles: no non-null values (and no "
                "explicit lo/hi) to derive the bin range from")
        lo = float(r[0]) if lo is None else lo
        hi = float(r[1]) if hi is None else hi
    if not (math.isfinite(lo) and math.isfinite(hi)):
        # a +-inf VALUE is real order information the fixed-width
        # histogram cannot bin — refuse loudly rather than emit
        # inf/NaN estimates; callers with infinities pass explicit
        # finite lo/hi (infinite outliers then clamp to the edge bins)
        raise ValueError(
            f"histogram_quantiles: derived range [{lo}, {hi}] is not "
            "finite; pass explicit lo/hi to bin data with infinities")
    if hi <= lo:
        hi = lo + 1.0  # degenerate constant column: one bin holds all
    width = (hi - lo) / bins
    bin_idx = bin_index(value_col, lo, hi, bins)
    keys = [group_col] if group_col else []
    hist = (vals.groupBy(*keys, bin_idx.alias("_bin"))
            .agg(F.count(F.lit(1)).alias("_cnt")))
    w = (Window.partitionBy(*keys) if keys
         else Window.partitionBy(F.lit(1))).orderBy("_bin")
    cum = (hist
           .withColumn("_cum", F.sum("_cnt").over(w))
           .withColumn("_n", F.sum("_cnt").over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))))
    # one explode over the (tiny) cumulative histogram — NOT a per-prob
    # loop of filters, which would replay the corpus scan once per prob
    probs_arr = lit_array(probs, "double")
    return (cum.withColumn("prob", F.explode(probs_arr))
            .filter(F.col("_cum") >= F.col("prob") * F.col("_n"))
            .groupBy(*keys, "prob")
            .agg(F.min("_bin").alias("_b"), F.max("_n").alias("n"))
            .select(*keys, "prob",
                    (F.lit(lo) + (F.col("_b") + 1) * F.lit(width))
                    .alias("quantile_est"), "n"))


def zorder_key(
    cols: list, bits: int = 16,
    ranges: list[tuple[float, float]] | None = None,
) -> Column:
    """Z-order (Morton) sort key over 2+ numeric columns: quantize each
    to ``bits`` levels, interleave the bits. Writing files sorted by
    this key clusters ALL the keyed columns at once, so parquet min/max
    stats prune scans filtered on ANY of them — single-column sort keys
    only skip for their leading column. This is the lakehouse
    multi-dimensional-clustering technique (public: Morton 1966; used
    by Delta/Iceberg OPTIMIZE ZORDER).

    ``ranges`` gives (lo, hi) per column for the quantization; required,
    because deriving them here would add an aggregation pass to what
    must stay a pure projection (compute them once upstream). Values
    outside [lo, hi] clamp. The expression is ``bits * ncols`` codegen'd
    bit ops — no shuffle, no Python; feed it to
    ``repartitionByRange``/``sortWithinPartitions`` (e.g. via
    ``stage_sorted``'s key) to lay files out.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if ranges is None or len(ranges) != n:
        raise ValueError("zorder_key needs one (lo, hi) range per column")
    if bits < 1 or bits * n > 63:
        raise ValueError("bits * ncols must fit in a signed long")
    quantized = []
    for c, (lo, hi) in zip(cols, ranges):
        col = F.col(c) if isinstance(c, str) else c
        if hi <= lo:
            raise ValueError(f"empty range ({lo}, {hi})")
        scaled = (F.least(F.lit(float(hi)),
                          F.greatest(F.lit(float(lo)),
                                     col.cast("double")))
                  - lo) / (hi - lo) * ((1 << bits) - 1)
        quantized.append(F.round(scaled).cast("long"))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z
