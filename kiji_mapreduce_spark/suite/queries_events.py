"""Event-table analytics: sessionization, gap-fill, JSON extraction,
anomaly scores, wide pivots, skew-safe top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from kiji_mapreduce_spark.suite.common import _events, _t


def q_events_anomaly_zscore(spark, sf_dir):
    """Per-type outlier detection: |z| >= 2.5 against the type's
    population mean/stddev. Shape: grouped agg (partial aggregation) +
    broadcast join back — NOT a window partitioned by event_type, which
    would serialize 100 TB into one task per type."""
    ev = _events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("_mean"),
        F.stddev_pop("value").alias("_std"))
    z = (F.col("value") - F.col("_mean")) / F.col("_std")
    return (ev.join(F.broadcast(stats), on="event_type")
            .filter(F.abs(z) >= 2.5)
            .select("event_id", "event_type", "value",
                    F.round(z, 4).alias("zscore")))


SQL_EVENTS_ANOMALY = """
WITH stats AS (
  SELECT event_type, avg(value) AS m, stddev_pop(value) AS s
  FROM events GROUP BY event_type
)
SELECT event_id, events.event_type, value,
       round((value - m) / s, 4) AS zscore
FROM events JOIN stats USING (event_type)
WHERE abs((value - m) / s) >= 2.5
"""


def q_events_json_props(spark, sf_dir):
    """Semi-structured extraction: parse the JSON ``props`` payload
    with a declared schema (``from_json`` — codegen'd, no Python) and
    aggregate the extracted field per event type. The schema-on-read
    path every event pipeline needs; Catalyst prunes the raw string
    scan to the one parsed field."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("k").alias("min_k"), F.max("k").alias("max_k"),
                 F.round(F.avg("k"), 4).alias("avg_k"),
                 F.count_distinct(F.col("k")).alias("n_distinct_k")))


SQL_EVENTS_JSON_PROPS = """
SELECT event_type, count(*) AS n_events,
       min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k,
       count(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS n_distinct_k
FROM events GROUP BY event_type
"""


def q_timeseries_gapfill(spark, sf_dir):
    """Gap-fill/resample (functions.gapfill_locf): each user's purchase
    values regularized onto a dense daily grid, missing days filled by
    last observation carried forward. Spine generated distributed
    (sequence+explode per key), fill is one running window — no global
    calendar cross-join."""
    from kiji_mapreduce_spark.functions import gapfill_locf

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    out = gapfill_locf(ev, ["user_id"], "ts", "value", "1 day")
    return out.select(
        "user_id", F.unix_millis("bucket").alias("bucket_ms"),
        F.round("value_filled", 4).alias("value_filled"), "observed")


SQL_TIMESERIES_GAPFILL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS bucket, max_by(value, ts) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), spine AS (
  SELECT user_id,
         unnest(generate_series(min(bucket), max(bucket),
                                INTERVAL 1 DAY)) AS bucket
  FROM daily GROUP BY user_id
)
SELECT s.user_id, epoch_ms(s.bucket) AS bucket_ms,
       round(last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS value_filled,
       d.v IS NOT NULL AS observed
FROM spine s LEFT JOIN daily d
  ON s.user_id = d.user_id AND s.bucket = d.bucket
"""


def q_pivot_wide_event_values(spark, sf_dir):
    """Wide pivot (reshape): one column per event type with its summed
    value per user (groupBy().pivot() with explicit values)."""
    ev = _events(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (ev.groupBy("user_id")
            .pivot("event_type", kinds)
            .agg(F.round(F.sum("value"), 2))
            .select("user_id", *[F.col(k).alias(f"sum_{k}") for k in kinds]))


SQL_PIVOT_WIDE = """
SELECT user_id,
       round(sum(value) FILTER (event_type = 'click'), 2) AS sum_click,
       round(sum(value) FILTER (event_type = 'error'), 2) AS sum_error,
       round(sum(value) FILTER (event_type = 'purchase'), 2) AS sum_purchase,
       round(sum(value) FILTER (event_type = 'signup'), 2) AS sum_signup,
       round(sum(value) FILTER (event_type = 'view'), 2) AS sum_view
FROM events GROUP BY user_id
"""


def q_salted_topk_events(spark, sf_dir):
    """Skew-safe top-3 events per type via the two-phase salted window
    (functions.salted_topk): a hot event_type's rows split across 16
    deterministic sub-partitions for the local pass, so no single task
    owns a hot key — same result as the plain window, verified by the
    plain-window oracle."""
    from kiji_mapreduce_spark.functions import salted_topk

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "value")
    out = salted_topk(ev, "event_type", "value", k=3,
                      tiebreak_cols=["event_id"])
    return out.select("event_type", "event_id",
                      F.round("value", 2).alias("value"), "rank")


SQL_SALTED_TOPK_EVENTS = """
SELECT event_type, event_id, round(value, 2) AS value, rank FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rank
  FROM events
) WHERE rank <= 3
"""
