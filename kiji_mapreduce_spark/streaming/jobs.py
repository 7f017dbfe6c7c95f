"""Structured-Streaming surface.

The reference is batch-only (SURVEY.md §2.6: streaming absent; the
out-of-band 'freshener' concept lives in a separate project). The engine
exposes the same operator classes over streams:

- ``stream_operator``: run any batch archetype per micro-batch via
  ``foreachBatch`` — every operator in the engine is instantly streaming-
  capable without a second implementation (incremental produce jobs =
  fresheners on a schedule);
- ``windowed_aggregate``: watermarked event-time windows (late-data-safe
  gather+reduce);
- ``running_latest``: custom stateful operator via
  ``applyInPandasWithState`` keeping the most-recent (ts, value) per key —
  the streaming twin of the versioned-cell 'latest' read.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kiji_mapreduce_spark.functions import lit_array
from kiji_mapreduce_spark.operators.base import Operator, OperatorContext


def _start_foreach_batch(df, fn, checkpoint: str,
                         trigger_available_now: bool,
                         output_mode: str | None = None):
    """The one shared writer block for every foreachBatch job in this
    module (r13 review finding: five hand-copied instances that a
    future trigger/queryName change would have to hit identically;
    ``output_mode`` folds in the one variant that had stayed inline)."""
    writer = df.writeStream
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    writer = writer.foreachBatch(fn) \
        .option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_to_memory(result: DataFrame, output_mode: str,
                    query_prefix: str,
                    state_partitions: int | None = 8,
                    timeout_sec: int = 300) -> DataFrame:
    """Start ``result`` as an availableNow streaming query into a
    memory sink, drain it to completion, and return the sink table.

    ``state_partitions`` sizes the query's state-store partitioning
    (``None`` inherits the session shuffle default). A streaming
    query's state partition count is captured from
    ``spark.sql.shuffle.partitions`` at query start, FROZEN into the
    checkpoint forever, and never touched by AQE (adaptive execution
    does not apply to streaming plans) — so a batch-oriented session
    default leaks into every micro-batch as per-partition state-store
    open/commit overhead (one delta file + fsync per partition per
    batch per stateful operator). Sizing it to the query's state
    volume instead is the standard production discipline; measured at
    sf0.1/local[32]: the five suite streams drop from 16.7 s to
    10.3 s total at 8 partitions, with the stateful micro-batch's
    task-time falling ~4x (19.5 s -> ~5 s for windowed counts). The
    memory sink collects results to the driver, so this helper is
    inherently a test/bench surface: production jobs use the
    table/foreachBatch writers above and pick a real checkpoint and a
    state partition count matched to their key cardinality.

    NOT re-entrant: the helper temporarily sets the session-global
    ``spark.sql.shuffle.partitions`` (restored in ``finally``), so two
    concurrent query BUILDS in one session would race, and a batch
    query planned inside the window would capture the streaming value.
    The suite builds queries sequentially; a concurrent caller should
    clone the session (``spark.newSession()``) first (VERDICT r14).
    """
    import uuid

    spark = result.sparkSession
    qname = f"{query_prefix}_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(state_partitions))
    try:
        q = (result.writeStream.outputMode(output_mode).format("memory")
             .queryName(qname).trigger(availableNow=True).start())
        q.awaitTermination(timeout_sec)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)


def stream_operator(
    stream_df: DataFrame,
    operator: Operator,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = True,
    context: OperatorContext | None = None,
):
    """Apply a batch operator to each micro-batch and hand the result to
    ``sink(batch_df, batch_id)``. Returns the StreamingQuery."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(operator.compile(batch_df, context), batch_id)

    return _start_foreach_batch(stream_df, _process, checkpoint,
                                trigger_available_now)


def _ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require a TIMESTAMP (local-tz) event-time column
    (Spark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).
    Parquet written with TIMESTAMP(NANOS)/isAdjustedToUTC=false reaches
    the file-stream source as TIMESTAMP_NTZ, so coerce defensively here
    rather than making every caller know the parquet writer's dialect.
    The engine pins spark.sql.session.timeZone=UTC (session.py), so the
    NTZ->TIMESTAMP cast is an exact round-trip — fail loudly for sessions
    built another way, where the cast would silently shift every window
    by the zone offset."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise ValueError(
                f"streaming event-time coercion of NTZ column {ts_col!r} "
                f"requires spark.sql.session.timeZone=UTC (got {tz!r}); "
                "build the session with kiji_mapreduce_spark.session."
                "make_session or set the conf explicitly")
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_aggregate(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded — the 100 TB-safe default)."""
    group_cols = group_cols or []
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    stream_df = _ensure_event_time(stream_df, ts_col)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(*aggs)
    )


def sessionized_aggregate(
    stream_df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Watermarked session-window aggregation: per-key sessions close
    after ``gap`` of inactivity (``F.session_window``; the batch
    lag/cumsum form is its oracle, ``suite.SQL_SESSIONIZE``).
    Session state is bounded by the watermark: a session older than the
    watermark can never be extended, so Spark evicts it — the property
    that keeps per-user session state finite on an unbounded stream.

    ``group_cols`` must be non-empty: Spark's streaming session-window
    aggregation requires at least one grouping key besides the session
    window itself, so a keyless call would only fail later, at stream
    start, with an opaque AnalysisException."""
    if not group_cols:
        raise ValueError(
            "sessionized_aggregate requires at least one group column "
            "(streaming session windows cannot aggregate globally)")
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    stream_df = _ensure_event_time(stream_df, ts_col)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*group_cols, F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
    )


def stream_into_table(
    put_stream: DataFrame,
    table,
    checkpoint: str,
    trigger_available_now: bool = True,
    mode: str = "delta",
):
    """Continuously ingest a stream of puts into an EntityTable.

    ``put_stream`` rows follow the merge_put contract: (entity_id,
    family, qualifier, ts, value_str). The streaming twin of the
    direct-writer path and the engine's answer to continuous bulk
    import.

    ``mode='delta'`` (default) appends each micro-batch to the table's
    delta log (``EntityTable.put_delta``): O(batch) per trigger with no
    base read, the only shape that survives a high-frequency trigger on
    a 100 TB table — readers see fragments via merge-on-read, and a
    periodic ``flush_deltas``/``optimize`` folds them in. The batch id
    is passed through, so foreachBatch's at-least-once replay
    OVERWRITES the replayed batch's own ``_batch`` partition instead of
    appending duplicate fragments — ``table_change_stream`` consumers
    see each put once (r13 review finding; the same batch_id-partition
    discipline as every other streaming writer in this file).
    ``mode='merge'`` merges each batch immediately (bucket-scoped base
    rewrite per trigger): stronger read-optimized freshness, for
    low-frequency triggers on modest tables. Merge replay is
    convergent (same-ts puts overwrite) but not append-duplicating by
    construction — there is no log to duplicate.
    """
    if mode not in ("delta", "merge"):
        raise ValueError(f"stream_into_table mode {mode!r}: "
                         "expected 'delta' or 'merge'")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if mode == "delta":
            table.put_delta(batch_df, batch_id=batch_id)
        else:
            table.merge_put(batch_df)

    return _start_foreach_batch(put_stream, _merge, checkpoint,
                                trigger_available_now)


def stream_dedup_exact(stream_df: DataFrame, text_col: str = "text",
                       ts_col: str = "ts", watermark: str = "24 hours",
                       digest_col: str = "digest") -> DataFrame:
    """Streaming exact dedup: emit only the first-seen copy of each
    content digest — the streaming twin of
    ``dedup.drop_exact_duplicates`` for continuous ingest.

    ``dropDuplicatesWithinWatermark`` keys the dedup state on the digest
    and expires entries once the watermark passes them, so state is
    bounded by (dedup horizon x ingest rate), not corpus size — the only
    formulation that survives an unbounded 100 TB/day stream. A
    duplicate arriving later than ``watermark`` after its first copy
    can re-emit; pick the horizon accordingly.

    NULL-text rows (extraction failures) pass through UN-deduped: their
    digest is NULL, and keying the dedup state on it treated every
    null-text row as a duplicate of the first one — unrelated records
    silently discarded (r13 review finding). Failures are not
    duplicates of each other; whether to keep them is a downstream
    policy decision, so the stream must not eat them here.
    """
    base = (_ensure_event_time(stream_df, ts_col)
            .withColumn(digest_col, F.md5(F.col(text_col)))
            .withWatermark(ts_col, watermark))
    deduped = (base.filter(F.col(digest_col).isNotNull())
               .dropDuplicatesWithinWatermark([digest_col]))
    return deduped.unionByName(base.filter(F.col(digest_col).isNull()))


def stream_media_dedup(
    stream_df: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint: str,
    content_col: str = "content",
    id_col: str = "media_id",
    kind: str = "image",
    max_hamming: int = 3,
    bands: int = 4,
    every_n: int = 1,
    min_frames: int = 2,
    use_real_decoder: bool = False,
    skip_undecodable: bool = True,
    trigger_available_now: bool = True,
):
    """Streaming perceptual-hash media dedup against a PERSISTED code
    index — the ingest-time twin of ``multimodal.*_near_duplicates``,
    built like ``dedup.minhash_dedup_incremental``: each micro-batch is
    decoded once into 64-bit codes, band-joined against the index
    (pairs where at least one side is new — old-vs-old never
    re-surfaces), the pairs written to ``pairs_dir`` and the batch's
    codes to ``index_dir``, each into a ``batch_id=N`` partition so
    foreachBatch's at-least-once replay after a crash OVERWRITES the
    same partition instead of duplicating rows. State the stream
    carries is ZERO (the index is a parquet table, not operator
    state), so the job survives restarts and the index doubles as a
    queryable corpus fingerprint catalog. Candidate volume scales with
    the batch, not the corpus — the only shape that survives
    100 TB/day ingest.

    ``kind``: image (dHash), audio (frame-energy fingerprint), or
    video (sampled per-frame dHash; pairs require ``min_frames``
    frame-aligned matches, and the index stores (id, frame_no, code)).
    ``skip_undecodable`` defaults ON here — one bad blob must not kill
    a continuous ingest job. Returns the started StreamingQuery.
    """
    from kiji_mapreduce_spark.pipeline import multimodal

    if kind not in ("image", "audio", "video"):
        raise ValueError(f"unknown media kind {kind!r}")
    if "kind" in stream_df.columns:
        # a crawl_media table mixes image/audio/video rows; without
        # this the kind's decoder would hit the first other-kind body
        # and kill the stream (the batch CLI applies the same scope)
        stream_df = stream_df.filter(F.col("kind") == kind)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # missing dir -> first batch; any OTHER read failure re-raises
        # (treating a corrupt/unreadable index as 'no index' would
        # silently lose every batch-vs-corpus pair forever)
        index = multimodal.read_code_index(spark, index_dir)
        # one decode per batch: media_dedup_incremental checkpoints the
        # codes, so the band join AND the index append below share them
        # without re-reading media bytes
        pairs, codes = multimodal.media_dedup_incremental(
            batch_df, index, kind, content_col, id_col, every_n,
            max_hamming, bands, min_frames, use_real_decoder,
            skip_undecodable, return_codes=True)
        # batch_id-partitioned overwrites make foreachBatch's
        # at-least-once replay idempotent: a crash between these writes
        # and the checkpoint commit replays the batch into the SAME
        # partition instead of appending duplicate pairs / index rows
        pairs.write.mode("overwrite") \
            .parquet(f"{pairs_dir}/batch_id={batch_id}")
        codes.write.mode("overwrite") \
            .parquet(f"{index_dir}/batch_id={batch_id}")

    return _start_foreach_batch(stream_df, _process, checkpoint,
                                trigger_available_now)


_LATEST_STATE_SCHEMA = "ts long, value double"
_LATEST_OUT_SCHEMA = "key long, ts long, value double"


def _latest_fn(key, pdf_iter, state: GroupState):
    """Keep the max-(ts, value) pair per key across micro-batches.

    NULL ts/value arrive as pandas NaN and are SKIPPED: a row without
    an event time is not ordered, and a NaN value winning on ts would
    stick forever (NaN comparisons are all False, so no later same-ts
    value could displace it — r13 review finding). A key whose rows are
    ALL null emits nothing and stores no state, instead of leaking the
    (-2^62, -inf) init sentinel as a real observation."""
    if state.exists:
        ts, value = state.get
        seen = True
    else:
        ts, value = -(1 << 62), float("-inf")
        seen = False
    for pdf in pdf_iter:
        for row_ts, row_v in zip(pdf["ts"], pdf["value"]):
            if pd.isna(row_ts) or pd.isna(row_v):
                continue
            if (int(row_ts), float(row_v)) > (ts, value):
                ts, value = int(row_ts), float(row_v)
                seen = True
    if not seen:
        return
    state.update((ts, value))
    yield pd.DataFrame({"key": [key[0]], "ts": [ts], "value": [value]})


def running_latest(stream_df: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts_ms", value_col: str = "value") -> DataFrame:
    """Custom stateful operator: per-key running most-recent value
    (ties broken by value, matching cells.latest ordering).

    The key keeps its NATIVE type: a hardcoded long cast killed the
    stream on string keys under Spark 4's ANSI default
    (CAST_INVALID_INPUT on the first micro-batch), or with ANSI off
    silently merged every key into one NULL state group — the exact
    bug class the kmeans cluster-label cast fix recorded
    (r13 review finding)."""
    key_type = dict(stream_df.dtypes)[key_col]
    normalized = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _latest_fn,
        outputStructType=f"key {key_type}, ts long, value double",
        stateStructType=_LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "30 minutes",
    upper: str = "0 seconds",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events of the same ``on`` key whose time falls in
    ``[left_ts - lower, left_ts + upper]``.

    The canonical two-stream correlation (purchase <- preceding clicks).
    Both sides carry watermarks and the join condition bounds the time
    difference in both directions, so Spark can size and EXPIRE the join
    state — without the range bound, stream-stream join state grows
    forever; with it, state is (rate x horizon) per side, the only
    formulation that survives an unbounded stream. Inner join in append
    mode: a pair emits once both watermarks pass it.
    """
    left = _ensure_event_time(left, left_ts)
    right = _ensure_event_time(right, right_ts)
    lcol = F.col(f"_l.{left_ts}")
    rcol = F.col(f"_r.{right_ts}")
    cond = (
        (F.col(f"_l.{on}") == F.col(f"_r.{on}"))
        & (rcol >= lcol - F.expr(f"INTERVAL {lower}"))
        & (rcol <= lcol + F.expr(f"INTERVAL {upper}"))
    )
    return (left.withWatermark(left_ts, watermark).alias("_l")
            .join(right.withWatermark(right_ts, watermark).alias("_r"),
                  cond, "inner"))


def stream_rollup_into_table(
    stream_df: DataFrame,
    table,
    checkpoint: str,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
    to_rows: Callable[[DataFrame], DataFrame] | None = None,
    trigger_available_now: bool = True,
):
    """Continuous aggregate: maintain a time-bucketed rollup of a stream
    AS an EntityTable (the materialized-view pattern — dashboards read
    the tiny rollup table, never the raw stream).

    Watermarked windowed aggregation in UPDATE mode, so each micro-batch
    emits only the windows the batch changed; those rows upsert into the
    table through its bucket-scoped write path. Incremental on both
    sides: the aggregation state carries only open windows (watermark-
    bounded) and the table write touches only the buckets of changed
    windows — a day-long stream never rewrites January.

    ``to_rows(batch_df) -> DataFrame`` shapes the aggregate output
    (window struct + group cols + agg cols) into the table's logical
    rows (entity_id + families); omit it if the stream query already
    emits table-shaped rows.
    """
    agg = windowed_aggregate(
        stream_df, ts_col, window_duration, watermark, group_cols, aggs)

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.upsert_rows(to_rows(batch_df) if to_rows else batch_df)

    return _start_foreach_batch(agg, _upsert, checkpoint,
                                trigger_available_now,
                                output_mode="update")


def table_change_stream(table, include_bucket: bool = False) -> DataFrame:
    """Change data feed: tail an EntityTable's delta log as a stream.

    ``put_delta`` appends immutable parquet fragments to the table's
    delta directory; Spark's file source treats that directory as an
    append-only log, so every new fragment becomes a micro-batch row
    set — downstream consumers (index maintenance, rollup tables, cache
    invalidation) subscribe to table changes without polling the base
    or re-scanning anything. Each change row is a put fragment
    (entity_id, family, qualifier, ts, value_str) plus ``_seq``, the
    table's monotone fragment sequence number.

    Note ``flush_deltas`` clears the log after folding fragments into
    the base; a subscriber that must not miss changes either keeps its
    own checkpoint ahead of the flush cadence or reads with
    ``cleanSource`` semantics. (The 100 TB deployment runs flushes from
    the same scheduler as the subscribers, so ordering is explicit.)
    """
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType)

    # the put-fragment contract written by put_delta: addressing +
    # string-encoded value + fragment seq + bucket partition column
    schema = StructType([
        StructField("entity_id", table.layout.row_key.spark_type()),
        StructField("family", StringType()),
        StructField("qualifier", StringType()),
        StructField("ts", LongType()),
        StructField("value_str", StringType()),
        StructField("_seq", LongType()),
        StructField("_batch", LongType()),
        StructField("_bucket", IntegerType()),
    ])
    reader = (table.spark.readStream
              .schema(schema)
              .option("maxFilesPerTrigger", 64)
              .parquet(table._delta_path())
              .drop("_batch"))  # write-side replay bookkeeping
    return reader if include_bucket else reader.drop("_bucket")


def stream_countmin(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    depth: int = 4,
    width: int = 512,
    hash_fn: str = "xx",
    weight_col: str | None = None,
) -> DataFrame:
    """Streaming count-min sketch: per time window, the same
    (cm_row, cm_bucket, cm_count) cell table ``sketch.countmin_table``
    builds in batch — heavy-hitter estimates over an unbounded stream
    with state bounded at open-windows x depth x width cells (the
    watermark closes windows; late events beyond it are dropped).

    Cells are sums, so Structured Streaming maintains them incrementally
    per micro-batch; closed windows merge with batch-built sketches by
    cell-wise addition (CMS mergeability), giving one probe surface over
    historical parquet + live stream."""
    from kiji_mapreduce_spark.pipeline.sketch import cm_expand

    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    probed = (cm_expand(stream_df, value_col, depth, width, hash_fn)
              .withColumn("_w", w))
    return windowed_aggregate(
        probed, ts_col, window_duration, watermark,
        group_cols=["cm_row", "cm_bucket"],
        aggs=[F.sum("_w").alias("cm_count")])


def stream_drift(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    ref_hist: list[int],
    lo: float,
    hi: float,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    epsilon: float = 1e-6,
) -> DataFrame:
    """Streaming distribution-drift monitor: per time window, the PSI of
    the window's histogram of ``value_col`` against a FIXED reference
    histogram -> (window, n_events, psi, drifted) — the streaming twin
    of ``audit.distribution_drift`` (same bin clamping, same epsilon
    smoothing, same 0.25 drift threshold), for catching corpus-mixture
    shift in an ingest stream against the training-set distribution.

    ``ref_hist`` is the reference's per-bin counts (its length fixes the
    bin count; build it once with the batch op's discipline over lo/hi).
    The reference is literal-folded into the plan — nothing joins.

    Single stateful aggregation: the per-window histogram is ``bins``
    conditional sums in ONE windowed groupBy (state = open-windows x
    bins cells, watermark-bounded), and PSI is a stateless projection
    over that row — so the job stays inside Structured Streaming's
    one-stateful-op happy path and works in append mode.
    """
    bins = len(ref_hist)
    if bins < 2:
        raise ValueError("stream_drift needs a reference with >= 2 bins")
    ref_total = float(sum(ref_hist))
    if ref_total <= 0:
        raise ValueError("stream_drift: empty reference histogram")
    if hi <= lo:
        raise ValueError("stream_drift needs hi > lo")
    # shared bin arithmetic (functions.bin_index): the documented
    # stream-vs-batch PSI parity ("same bin clamping") holds because
    # this, audit.distribution_drift, and histogram_quantiles all call
    # the one expression builder
    from kiji_mapreduce_spark.functions import bin_index

    idx = bin_index(value_col, float(lo), float(hi), bins)
    hist = [F.sum(F.when(idx == i, 1).otherwise(0)).alias(f"_b{i}")
            for i in range(bins)]
    agg = windowed_aggregate(
        stream_df.filter(F.col(value_col).isNotNull()), ts_col,
        window_duration, watermark, group_cols=[],
        aggs=hist + [F.count(F.lit(1)).alias("n_events")])
    n = F.col("n_events").cast("double")
    psi = F.lit(0.0)
    for i in range(bins):
        p_ref = F.lit(ref_hist[i] / ref_total + epsilon)
        p_win = F.col(f"_b{i}") / n + epsilon
        psi = psi + (p_win - p_ref) * F.log(p_win / p_ref)
    # binned KS from the SAME bin sums (stateless projection — no new
    # state): max cumulative-CDF gap, unsmoothed like the batch op
    # (epsilon is a log guard, not a probability), so a stream consumer
    # can apply batch ``distribution_drift``'s two-signal policy.
    # One aggregate() fold over a bins-length array, NOT a chained
    # greatest(cum_0.., cum_1..) literal pyramid: the pyramid is an
    # O(bins^2)-node tree that streaming re-codegens every micro-batch
    # (measured +1.5s/query at 20 bins); the fold is O(bins) nodes and
    # keeps the exact left-to-right add order, so values are
    # bit-identical and the batch-SQL oracle still matches.
    win_fracs = F.array(*[F.col(f"_b{i}") / n for i in range(bins)])
    ref_fracs = lit_array(
        [ref_hist[i] / ref_total for i in range(bins)], "double")
    zipped = F.zip_with(
        win_fracs, ref_fracs, lambda w, r: F.struct(w.alias("w"),
                                                    r.alias("r")))
    ks = F.aggregate(
        zipped,
        F.struct(F.lit(0.0).alias("cw"), F.lit(0.0).alias("cr"),
                 F.lit(0.0).alias("ks")),
        lambda acc, x: F.struct(
            (acc["cw"] + x["w"]).alias("cw"),
            (acc["cr"] + x["r"]).alias("cr"),
            F.greatest(
                acc["ks"],
                F.abs((acc["cw"] + x["w"]) - (acc["cr"] + x["r"]))
            ).alias("ks")),
        lambda acc: acc["ks"])
    return agg.select(
        "window", "n_events",
        F.round(psi, 6).alias("psi"),
        F.round(ks, 6).alias("ks"),
        (psi > 0.25).alias("drifted"))


def _upsert_batch_stat(stats: list, row: dict) -> None:
    """Replace an existing ``batch_id`` row or append. foreachBatch is
    at-least-once: a batch replayed after a failure re-enters with the
    SAME batch_id, and the parquet side is replay-idempotent (partition
    overwrite) — appending would double-count the batch in the per-run
    totals (r9 verdict #6)."""
    for i, prev in enumerate(stats):
        if prev["batch_id"] == row["batch_id"]:
            stats[i] = row
            return
    stats.append(row)


def stream_crawl_ingest(
    spark,
    input_glob: str,
    output_dir: str,
    checkpoint: str,
    lenient: bool = True,
    min_tokens: int = 1,
    psl_rules=None,
    heuristic_domains: bool = False,
    trigger_available_now: bool = True,
    batch_stats: list | None = None,
    media_output: str | None = None,
    respect_noindex: bool = True,
    blocked_domains=None,
    url_patterns=None,
    main_content: bool = False,
    transcode: bool = False,
):
    """Continuous crawl ingest: watch ``input_glob`` for NEW WARC
    archives (the shape 100 TB crawls actually land in — segments
    arriving over hours) and append documents-shaped rows to
    ``output_dir`` — the streaming twin of ``kiji-mr crawl-ingest``,
    sharing its whole transformation via ``pipeline.crawl
    .crawl_documents`` so batch and stream cannot drift.

    Scale shape: the binaryFile stream source checkpoints WHICH files
    were processed (each archive exactly once across restarts); each
    micro-batch parses only its new archives and writes into a
    ``batch_id=N`` partition with OVERWRITE, so foreachBatch's
    at-least-once replay after a crash rewrites the same partition
    instead of duplicating documents. Doc ids stay the deterministic
    ``xxhash64(path, record_no)``, so a replay (or a later batch
    re-shipping an archive under the same path) cannot fork ids.
    Per-domain caps are a CORPUS-level decision and deliberately not
    applied per batch — run ``sample.stratum_topk`` over the
    accumulated output for that.

    ``lenient`` defaults ON here — one truncated archive must not kill
    a continuous ingest job (the batch CLI defaults strict). Worse than
    the one-off crash: the file-source offset log already claims the
    batch, so a strict failure replays the SAME corrupt archive on
    every restart and the ingest wedges permanently.

    ``batch_stats``: optional list that receives one
    ``{"batch_id", "n_docs"}`` dict per non-empty micro-batch —
    foreachBatch runs on the driver, so a plain closure list works.
    Counting reads back only the freshly written partition (O(this
    batch), never O(accumulated corpus)).

    ``media_output``: also extract each batch's image/audio/video
    responses (``pipeline.crawl.crawl_media``) into batch_id=
    partitions under this dir — media extraction is per-RECORD work,
    so unlike the corpus-level passes it streams naturally; the same
    replay-idempotence (partition overwrite + deterministic ids)
    applies. Each batch's archives are parsed twice (docs + media
    derivations), mirroring the batch CLI's extra pass per output.
    Returns the started StreamingQuery.
    """
    from kiji_mapreduce_spark.io.inputs import (BINARY_FILE_SCHEMA,
                                                warc_records_from_files)
    from kiji_mapreduce_spark.pipeline.crawl import (blocklist_table,
                                                     crawl_documents,
                                                     crawl_media,
                                                     filter_blocked)

    files = (spark.readStream.format("binaryFile")
             .schema(BINARY_FILE_SCHEMA).load(input_glob))
    # the blocklist table is static for the stream's lifetime: build
    # (and broadcast) it ONCE here, not per micro-batch (r12 review
    # finding — re-serializing a UT1-scale list every batch)
    bl_table = (blocklist_table(spark, blocked_domains)
                if blocked_domains else None)

    def _process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recs = warc_records_from_files(batch_df, lenient=lenient)
        if transcode:
            # per-RECORD work, so it streams naturally (the blocklist
            # rationale); the identity-charset fast path short-circuits
            # inside the one Arrow pass
            from kiji_mapreduce_spark.pipeline.crawl import \
                transcode_responses

            recs = transcode_responses(recs)
        docs = crawl_documents(
            recs, batch_df.sparkSession, min_tokens=min_tokens,
            psl_rules=psl_rules, heuristic_domains=heuristic_domains,
            respect_noindex=respect_noindex,
            main_content=main_content)
        if bl_table is not None or url_patterns:
            # blocklists are per-RECORD work, so they stream naturally
            # (unlike the corpus-level curation passes the CLI refuses
            # to combine with --stream). The DOMAIN join reads docs on
            # both sides, so pin first — one WARC parse per batch, not
            # two; the URL-pattern-only path is a single-pass filter
            # with no diamond and skips the pin
            if bl_table is not None:
                docs = docs.localCheckpoint(eager=True)
            docs = filter_blocked(
                docs, batch_df.sparkSession,
                blocked_domains=bl_table,
                url_patterns=url_patterns)
        part = f"{output_dir}/batch_id={batch_id}"
        docs.write.mode("overwrite").parquet(part)
        if media_output:
            media_rows = crawl_media(
                recs, batch_df.sparkSession, psl_rules=psl_rules,
                heuristic_domains=heuristic_domains,
                respect_noindex=respect_noindex)
            if bl_table is not None or url_patterns:
                # same diamond pin as the docs half: unpinned, the
                # archive parse + media extraction would run twice
                if bl_table is not None:
                    media_rows = media_rows.localCheckpoint(eager=True)
                media_rows = filter_blocked(
                    media_rows, batch_df.sparkSession,
                    blocked_domains=bl_table,
                    url_patterns=url_patterns, id_col="media_id")
            media_rows.write.mode("overwrite").parquet(
                f"{media_output}/batch_id={batch_id}")
        if batch_stats is not None:
            # foreachBatch is at-least-once: a batch replayed after a
            # failure re-enters here with the SAME batch_id. The parquet
            # write above is replay-idempotent (partition overwrite),
            # so the stats row must be too — replace the earlier row
            # for this batch_id instead of appending a duplicate
            # (r9 verdict #6)
            _upsert_batch_stat(batch_stats, {
                "batch_id": batch_id,
                "n_docs": batch_df.sparkSession.read.parquet(part)
                .count()})

    return _start_foreach_batch(files, _process, checkpoint,
                                trigger_available_now)


def stream_shard_ingest(
    spark,
    input_glob: str,
    output_dir: str,
    checkpoint: str,
    archive_format: str = "tar",
    webdataset: bool = False,
    lenient: bool = True,
    trigger_available_now: bool = True,
    batch_stats: list | None = None,
):
    """Continuous dataset-shard ingest: watch ``input_glob`` for NEW
    tar/zip shards (how multimodal corpora actually land — thousands
    of ~1 GB shards arriving over hours) and append member rows — or
    WebDataset sample rows (``webdataset=True``) — to ``output_dir``;
    the streaming twin of the ``format=tar|zip|webdataset`` job
    inputs, sharing their parser halves so batch and stream cannot
    drift (the ``stream_crawl_ingest`` precedent).

    Scale shape: the binaryFile stream source checkpoints WHICH files
    were processed (each shard exactly once across restarts); each
    micro-batch parses only its new shards into a ``batch_id=N``
    partition with OVERWRITE, so foreachBatch's at-least-once replay
    rewrites the same partition instead of duplicating members.
    ``lenient`` defaults ON: a strict failure inside foreachBatch
    replays the same corrupt shard forever (the offset log already
    claims the batch) and the ingest wedges permanently."""
    from kiji_mapreduce_spark.io.inputs import (
        BINARY_FILE_SCHEMA, archive_members_from_files,
        webdataset_samples_from_files)

    # fail-fast BEFORE the query starts (the stream_into_table mode
    # check's discipline): an unknown format raising inside
    # foreachBatch fires only after the offset log claims the batch,
    # so every restart replays straight into the same error — the
    # permanent-wedge failure the docstring warns about (r13 review
    # finding). webdataset=True ignores archive_format entirely; a
    # conflicting non-default value is a caller confusion, not a
    # choice to honor silently.
    if webdataset:
        if archive_format != "tar":
            raise ValueError(
                "stream_shard_ingest: webdataset=True reads tar "
                f"shards; conflicting archive_format={archive_format!r}")
    elif archive_format not in ("tar", "zip"):
        raise ValueError(
            f"unknown archive format {archive_format!r}")

    files = (spark.readStream.format("binaryFile")
             .schema(BINARY_FILE_SCHEMA).load(input_glob))

    def _process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if webdataset:
            rows = webdataset_samples_from_files(batch_df,
                                                 lenient=lenient)
        else:
            rows = archive_members_from_files(
                batch_df, archive_format, lenient=lenient)
        part = f"{output_dir}/batch_id={batch_id}"
        rows.write.mode("overwrite").parquet(part)
        if batch_stats is not None:
            _upsert_batch_stat(batch_stats, {
                "batch_id": batch_id,
                "n_rows": batch_df.sparkSession.read.parquet(part)
                .count()})

    return _start_foreach_batch(files, _process, checkpoint,
                                trigger_available_now)
