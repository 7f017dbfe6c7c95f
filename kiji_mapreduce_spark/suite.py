"""The engine's query suite over the driver's test tables.

Each entry exercises a specific operator from SURVEY.md §2 through the
engine's own API (operators / kv stores / cells / pipeline modules) and has
a DuckDB-equivalent oracle SQL (except genuinely non-SQL-expressible ops,
which are flagged rows-only).

Conventions for oracle hash-matching:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (sums -> 2 dp, ratios/avgs -> 4 dp) so
  accumulation-order FP noise cannot flip the value hash;
- timestamps cross the engine boundary as epoch milliseconds
  (``unix_millis`` / ``epoch_ms``);
- int casts that truncate use explicit ``floor`` in both dialects
  (Spark casts truncate; DuckDB casts round).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kiji_mapreduce_spark import cells
from kiji_mapreduce_spark.operators import (
    BulkImporter, CellRewriter, Gatherer, MapReduceOperator, Pivoter, Producer,
)
from kiji_mapreduce_spark.kvstore import DataFrameKeyValueStore
from kiji_mapreduce_spark import oracles
from kiji_mapreduce_spark.pipeline import (
    classifier, curate, decontaminate, dedup, graph, lm, sample, search,
    similarity, sketch, text as text_ops,
)


_SHIPPED_SESSIONS: set = set()


def _ensure_session_conf(spark: SparkSession) -> None:
    """Defensive setup for externally-created sessions (the driver builds
    its own SparkSession): nanos timestamps must read as long,
    epoch-millis conversions assume a UTC session (both runtime-settable),
    and the engine package must be importable on python WORKERS for the
    Pandas-UDF paths — shipped once per session via addPyFile (workers
    don't inherit the driver's sys.path)."""
    for k, v in (("spark.sql.legacy.parquet.nanosAsLong", "true"),
                 ("spark.sql.session.timeZone", "UTC")):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # already set at session build, or not settable here
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED_SESSIONS:
        return
    try:
        import os
        import tempfile
        import zipfile

        import kiji_mapreduce_spark as _pkg

        pkg_dir = os.path.dirname(os.path.abspath(_pkg.__file__))
        zip_path = os.path.join(
            tempfile.gettempdir(), f"kiji_mapreduce_spark_{app_id}.zip")
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for fname in files:
                        if not fname.endswith(".py"):
                            continue
                        full = os.path.join(root, fname)
                        rel = os.path.join(
                            "kiji_mapreduce_spark",
                            os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
        sc.addPyFile(zip_path)
        _SHIPPED_SESSIONS.add(app_id)
    except Exception:
        pass  # workers already have the package (e.g. installed/PYTHONPATH)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized: the driver writes TIMESTAMP(NANOS),
    which Spark reads as long nanos (nanosAsLong); expose epoch-millis
    ``ts_ms`` (matches DuckDB ``epoch_ms``) and a microsecond ``ts``."""
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        # integer division: nanos exceed double's 2^53 mantissa, so / would
        # drift by ±1 ms — `div` stays in long arithmetic
        ev = (ev.withColumn("ts_ms", F.expr("ts div 1000000"))
              .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    else:
        ev = ev.withColumn("ts_ms", F.unix_millis(F.col("ts").cast("timestamp")))
    return ev


# ---------------------------------------------------------------------------
# §2.3 Gatherer + reducer: scan -> flatMap -> combine/reduce (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

class _PricingSummaryGatherer(Gatherer):
    """Gather (returnflag, linestatus) keyed measures; reduce = grouped agg.
    Catalyst supplies the map-side combine the reference used a combiner
    for (MapReduceJobBuilder.java:438-448)."""

    def gather_df(self, df, ctx):
        return df.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        ).select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_disc_price"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))
             * (1 + F.col("l_tax"))).alias("_charge"),
            "l_discount",
        )

    def reduce_df(self, g, ctx):
        return g.groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum("_disc_price"), 2).alias("sum_disc_price"),
            F.round(F.sum("_charge"), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )


def q_gather_pricing_summary(spark, sf_dir):
    return _PricingSummaryGatherer().compile(_t(spark, sf_dir, "lineitem"))


SQL_GATHER_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# §2.5 filters / predicate pushdown (TPC-H Q6 shape)
# ---------------------------------------------------------------------------

def q_filter_pushdown_revenue(spark, sf_dir):
    """Filters + projection reach the Parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04) & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


SQL_FILTER_PUSHDOWN = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# §2.4 KV stores: broadcast lookup / semi / anti joins
# ---------------------------------------------------------------------------

def q_kvstore_lookup_join(spark, sf_dir):
    """get(key) enrich: customer rows + nation name via a broadcast KV
    store (miss -> null = left join, KeyValueStoreReader.get)."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    store = DataFrameKeyValueStore(
        df=nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name"),
        key_cols=["c_nationkey"])
    return store.lookup(customer, how="left").select(
        "c_custkey", "c_nationkey", "n_name")


SQL_KVSTORE_LOOKUP = """
SELECT c_custkey, c_nationkey, n_name
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""


def q_kvstore_avro_file_join(spark, sf_dir):
    """End-to-end file-backed Avro KV store (AvroRecordKeyValueStore.
    java:84): write the nation dim as a REAL Avro container file (the
    built-in codec, io/avro_codec.py), open it as a store, broadcast-join
    onto customers. Driver-verifies that the whole Avro write->read->
    first-wins->lookup path produces exactly the plain SQL join."""
    import os as _os
    import tempfile as _tempfile

    from kiji_mapreduce_spark.io.avro_io import write_avro
    from kiji_mapreduce_spark.kvstore.stores import AvroRecordKeyValueStore

    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation_name"))
    path = _os.path.join(
        _tempfile.gettempdir(),
        f"kiji_avro_nation_{_os.path.basename(sf_dir.rstrip('/'))}")
    write_avro(nation, path, nsplits=1)
    store = AvroRecordKeyValueStore(paths=[path], key_field="c_nationkey")
    customer = _t(spark, sf_dir, "customer")
    return store.lookup(customer, how="left").select(
        "c_custkey", "c_nationkey", "nation_name")


SQL_KVSTORE_AVRO_FILE = """
SELECT c_custkey, c_nationkey, n_name AS nation_name
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""


def q_semi_join_customers_with_orders(spark, sf_dir):
    """containsKey idiom -> left_semi."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    store = DataFrameKeyValueStore(
        df=orders.select(F.col("o_custkey").alias("c_custkey")),
        key_cols=["c_custkey"])
    return store.lookup(customer, how="left_semi").select("c_custkey", "c_name")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_anti_join_customers_without_orders(spark, sf_dir):
    """NOT containsKey: customers with no order in early 1995."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    store = DataFrameKeyValueStore(
        df=orders.select(F.col("o_custkey").alias("c_custkey")),
        key_cols=["c_custkey"])
    return store.lookup(customer, how="left_anti").select("c_custkey", "c_name")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate < TIMESTAMP '1995-04-01')
"""


# ---------------------------------------------------------------------------
# multi-join aggregate (TPC-H Q5 shape): broadcast dims, shuffle facts
# ---------------------------------------------------------------------------

def q_join_revenue_by_nation(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dims = F.broadcast(
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_JOIN_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# §2.3 Producer: per-row derive (same-row write-back shape)
# ---------------------------------------------------------------------------

class _PriceBandProducer(Producer):
    def output_column(self):
        return "derived:price_band"

    def produce_expr(self, df, ctx):
        return (
            F.when(F.col("o_totalprice") < 100000, "low")
            .when(F.col("o_totalprice") < 300000, "mid")
            .otherwise("high")
        )


def q_producer_price_band(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    out = _PriceBandProducer().compile(orders)
    return out.select("o_orderkey", F.col("price_band"))


SQL_PRODUCER_PRICE_BAND = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'low'
            WHEN o_totalprice < 300000 THEN 'mid'
            ELSE 'high' END AS price_band
FROM orders
"""


# ---------------------------------------------------------------------------
# §2.3 Pivoter: re-key rows into a different table
# ---------------------------------------------------------------------------

class _OrdersByCustomerPivoter(Pivoter):
    """Pivot order rows into a customer-keyed summary table."""

    def output_key(self):
        return ["c_custkey"]

    def pivot_df(self, df, ctx):
        return df.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.unix_millis(F.max("o_orderdate").cast("timestamp")).alias("last_order_ms"),
        )


def q_pivot_orders_by_customer(spark, sf_dir):
    return _OrdersByCustomerPivoter().compile(_t(spark, sf_dir, "orders"))


SQL_PIVOT_ORDERS = """
SELECT o_custkey AS c_custkey, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_spent,
       epoch_ms(max(o_orderdate)) AS last_order_ms
FROM orders GROUP BY o_custkey
"""


# ---------------------------------------------------------------------------
# §1.1 versioned cells: events -> versioned table -> latest value
# ---------------------------------------------------------------------------

def _events_as_cells(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        cells.cells_from_events(F.col("ts_ms"), F.col("value")).alias("value_cells"))


def q_versioned_latest_event_value(spark, sf_dir):
    """Build versioned cells per user; read back the most recent value
    (getMostRecentValue). Tie at equal ts resolves to max value (cells
    sort by (ts, value) desc)."""
    t = _events_as_cells(spark, sf_dir)
    return t.select(
        "user_id",
        cells.latest_value(F.col("value_cells")).alias("last_value"),
        F.size("value_cells").alias("n_versions"),
    )


SQL_VERSIONED_LATEST = """
SELECT user_id, value AS last_value, n_versions
FROM (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ms(ts) DESC, value DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_versions
  FROM events
) WHERE rn = 1
"""


def q_versioned_slice_maxversions(spark, sf_dir):
    """maxVersions=3 slice + ts-range filter: newest 3 readings per user
    within 2024, exploded back to rows (KijiDataRequest withMaxVersions)."""
    t = _events_as_cells(spark, sf_dir)
    lo = F.unix_millis(F.lit("2024-01-08 00:00:00").cast("timestamp"))
    sliced = t.select(
        "user_id",
        cells.retain_versions(
            F.filter(F.col("value_cells"), lambda c: c["ts"] >= lo), 3).alias("v3"))
    return sliced.select(
        "user_id", F.explode("v3").alias("cell")
    ).select("user_id", F.col("cell.ts").alias("ts_ms"),
             F.col("cell.value").alias("value"))


SQL_VERSIONED_SLICE = """
SELECT user_id, ts_ms, value FROM (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ms(ts) DESC, value DESC) AS rn
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# §2.3 CellRewriter: schema migration preserving timestamps
# ---------------------------------------------------------------------------

def q_cell_rewrite_int_to_long(spark, sf_dir):
    """int -> long cell migration preserving per-cell timestamps
    (KijiCellRewriter.convertAvro); exploded for comparison."""
    ev = _events(spark, sf_dir)
    table = ev.groupBy("user_id").agg(
        cells.cells_from_events(
            F.col("ts_ms"),
            F.floor(F.col("value")).cast("int")).alias("m"),
    ).select("user_id", F.struct(F.col("m").alias("reading")).alias("metrics"))
    rewriter = CellRewriter("metrics:reading", {"int": "long"})
    out = rewriter.compile(table)
    return out.select(
        "user_id", F.explode("metrics.reading").alias("cell")
    ).select("user_id", F.col("cell.ts").alias("ts_ms"),
             F.col("cell.value").alias("value_long"))


SQL_CELL_REWRITE = """
SELECT user_id, epoch_ms(ts) AS ts_ms,
       CAST(floor(value) AS BIGINT) AS value_long
FROM events
"""


# ---------------------------------------------------------------------------
# §2.1 map-family + RegexQualifierColumnFilter
# ---------------------------------------------------------------------------

def q_map_family_regex_filter(spark, sf_dir):
    """Map family (qualifier = event_type) filtered by qualifier regex
    '^p' (RegexQualifierColumnFilter), latest value per kept qualifier."""
    ev = _events(spark, sf_dir)
    per_qual = ev.groupBy("user_id", "event_type").agg(
        cells.cells_from_events(F.col("ts_ms"), F.col("value")).alias("cells"))
    as_map = per_qual.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cells"))).alias("fam"))
    filtered = as_map.select(
        "user_id",
        F.map_filter("fam", lambda k, _: k.rlike("^p")).alias("fam"))
    exploded = filtered.select(
        "user_id", F.explode("fam").alias("qualifier", "cells"))
    return exploded.select(
        "user_id", "qualifier",
        cells.latest_value(F.col("cells")).alias("latest_value"))


SQL_MAP_FAMILY_REGEX = """
SELECT user_id, event_type AS qualifier, value AS latest_value
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_ms(ts) DESC, value DESC) AS rn
  FROM events
  WHERE regexp_matches(event_type, '^p')
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# §2.3 BulkImporter: parse external records (JSON props) into table rows
# ---------------------------------------------------------------------------

class _PropsImporter(BulkImporter):
    """Parse the JSON ``props`` payload (regexp fast-path, no Python)."""

    def import_df(self, df, ctx):
        return df.select(
            F.col("event_id"),
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k"),
            F.col("event_type"),
        )


def q_bulk_import_props(spark, sf_dir):
    return _PropsImporter().compile(_t(spark, sf_dir, "events"))


SQL_BULK_IMPORT = """
SELECT event_id,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k,
       event_type
FROM events
"""


# ---------------------------------------------------------------------------
# §2.6 windows / set ops / rollup (free on Spark, absent in reference)
# ---------------------------------------------------------------------------

def q_window_top3_orders_per_customer(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


SQL_WINDOW_TOP3 = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_set_ops_nations(spark, sf_dir):
    """INTERSECT + EXCEPT in one plan: nations that have both customers
    and suppliers, minus nations with a rich supplier. (One query covers
    both set operators — the driver's correctness harness records at most
    50 rows, so the suite holds exactly 50 queries.)"""
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    rich = supplier.filter(F.col("s_acctbal") >= 9500)
    both = (customer.select(F.col("c_nationkey").alias("nationkey"))
            .intersect(supplier.select(F.col("s_nationkey").alias("nationkey"))))
    return both.subtract(rich.select(F.col("s_nationkey").alias("nationkey")))


SQL_SET_OPS = """
(SELECT c_nationkey AS nationkey FROM customer
 INTERSECT
 SELECT s_nationkey AS nationkey FROM supplier)
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal >= 9500
"""


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP (region, nation) with subtotal labels."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue")
    )


SQL_ROLLUP_REVENUE = """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# generic MapReduce: map + grouped reduce
# ---------------------------------------------------------------------------

class _EventStatsMR(MapReduceOperator):
    def group_keys(self):
        return ["event_type"]

    def map_df(self, df, ctx):
        return df.select("event_type", "value",
                         F.hour("ts").alias("hour"))

    def reduce_exprs(self, ctx):
        return [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("hour").alias("n_hours"),
        ]


def q_mapreduce_event_stats(spark, sf_dir):
    return _EventStatsMR().compile(_events(spark, sf_dir))


SQL_MAPREDUCE_EVENTS = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(avg(value), 4) AS avg_value,
       count(DISTINCT date_part('hour', ts)) AS n_hours
FROM events GROUP BY event_type
"""


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


def q_text_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_ops.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_txt"),
        text_ops.bpe_ish_token_count(F.col("text")).alias("n_subtokens"),
    )


SQL_TEXT_TOKEN_COUNT = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       length(text) AS n_chars_txt,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_subtokens
FROM documents
"""


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text_ops.quality_features(docs).select(
        "doc_id", "n_tokens", "avg_token_len", "punct_ratio",
        "digit_ratio", "stopword_ratio", "quality_score")


SQL_TEXT_QUALITY = r"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digits,
         len(list_filter(str_split_regex(lower(text), '\s+'),
             x -> list_contains(['the', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'was', 'for'], x))) AS n_stop
  FROM documents
), r AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens > 0 THEN (n_chars - n_tokens + 1.0) / n_tokens ELSE 0.0 END AS atl,
         CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END AS pr,
         CASE WHEN n_chars > 0 THEN n_digits * 1.0 / n_chars ELSE 0.0 END AS dr,
         CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS sr
  FROM f
)
SELECT doc_id, n_tokens,
       round(atl, 4) AS avg_token_len,
       round(pr, 4) AS punct_ratio,
       round(dr, 4) AS digit_ratio,
       round(sr, 4) AS stopword_ratio,
       round(CAST(
         (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
         (CASE WHEN atl BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END) +
         (CASE WHEN pr <= 0.2 THEN 0.2 ELSE 0.0 END) +
         (CASE WHEN dr <= 0.2 THEN 0.1 ELSE 0.0 END) +
         (CASE WHEN sr >= 0.01 THEN 0.1 ELSE 0.0 END) AS DOUBLE), 2) AS quality_score
FROM r
"""


def q_knn_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.select("query_id", "neighbor_id",
                      (F.round("cosine", 4) + F.lit(0.0)).alias("cosine"),
                      "rank")


SQL_KNN_COSINE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cosine, rank
FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# order+limit, set ops, cube, distinct, windows, key encodings, byte stats
# ---------------------------------------------------------------------------

def q_topk_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: global ORDER BY ... LIMIT (total-order top-k —
    Spark's TakeOrderedAndProject replaces the reference's total-order
    partitioner + sort job)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer.filter(F.col("c_mktsegment") == "BUILDING"),
              orders.o_custkey == F.col("c_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TOPK_SHIPPING = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_union_all_parties(spark, sf_dir):
    """UNION ALL + grouped count over heterogenous sources."""
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    both = (customer.select(F.col("c_nationkey").alias("nationkey"),
                            F.lit("customer").alias("kind"))
            .unionAll(supplier.select(F.col("s_nationkey").alias("nationkey"),
                                      F.lit("supplier").alias("kind"))))
    return both.groupBy("nationkey", "kind").agg(
        F.count(F.lit(1)).alias("n_parties"))


SQL_UNION_ALL = """
SELECT nationkey, kind, count(*) AS n_parties FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
) GROUP BY nationkey, kind
"""


def q_cube_order_stats(spark, sf_dir):
    """CUBE over (status, priority) with all subtotal combinations."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders", "avg_price")
    )


SQL_CUBE_ORDERS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_distinct_segments(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    return customer.select(F.col("c_mktsegment").alias("segment")).distinct()


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment AS segment FROM customer"


def q_entity_key_hash(spark, sf_dir):
    """Row-key encodings (SURVEY §1.1): HASH and HASH_PREFIX keys derived
    from FORMATTED components, matching the reference's deterministic
    hashed entity ids (md5-based)."""
    from kiji_mapreduce_spark.layout import RowKeySpec

    customer = _t(spark, sf_dir, "customer")
    rk = RowKeySpec(format="FORMATTED", components=[("custkey", "long")])
    with_eid = customer.select(
        F.struct(F.col("c_custkey").alias("custkey")).alias("entity_id"))
    packed = rk.key_expr()
    return with_eid.select(
        F.col("entity_id.custkey").alias("custkey"),
        F.md5(packed).alias("key_hash"),
        F.substring(F.md5(packed), 1, 4).alias("hash_prefix"),
    )


SQL_ENTITY_KEY_HASH = """
SELECT c_custkey AS custkey,
       md5(CAST(c_custkey AS VARCHAR)) AS key_hash,
       substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) AS hash_prefix
FROM customer
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


def q_text_byte_stats(spark, sf_dir):
    """Binary-column handling: byte vs char lengths (multibyte docs)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.length("text").alias("n_chars_txt"),
        (F.octet_length("text") > F.length("text")).alias("is_multibyte"),
    )


SQL_TEXT_BYTE_STATS = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       length(text) AS n_chars_txt,
       octet_length(encode(text)) > length(text) AS is_multibyte
FROM documents
"""


def q_window_running_revenue(spark, sf_dir):
    """Running totals + lag per customer (ordered analytic windows)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_total"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
    )


SQL_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       lag(o_orderkey, 1) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS prev_orderkey
FROM orders
"""


def q_asof_join_purchase_click(spark, sf_dir):
    """As-of join (engine extension, functions.asof_join): each purchase
    event picks up the most recent prior-or-equal click value of the same
    user. Union-tag implementation — one shuffle, no range explosion."""
    from kiji_mapreduce_spark.functions import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_ms", F.col("value").alias("click_value"))
    out = asof_join(purchases, clicks, on="user_id",
                    left_ts="ts_ms", value_cols=["click_value"])
    return out.select("event_id", "user_id", "ts_ms", "click_value")


SQL_ASOF_JOIN = """
WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts_ms, c.value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_ms >= c.ts_ms
"""


def q_range_join_price_bands(spark, sf_dir):
    """Binned range join (engine extension): parts priced into static
    bands via equi-join on bins instead of a nested-loop range join."""
    from kiji_mapreduce_spark.functions import range_join_binned

    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 1000.0), ("mid", 1000.0, 1500.0),
         ("premium", 1500.0, 10000.0)],
        "band string, lo double, hi double")
    out = range_join_binned(
        part, bands, left_point="p_retailprice",
        right_lo="lo", right_hi="hi", bin_width=500)
    return out.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"))


SQL_RANGE_JOIN = """
SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
FROM part
JOIN (VALUES ('budget', 0.0, 1000.0), ('mid', 1000.0, 1500.0),
             ('premium', 1500.0, 10000.0)) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def q_embedding_label_cosine_stats(spark, sf_dir):
    """Embedding-cosine near-dup machinery, oracle-checked: pairwise
    cosine stats within each label cluster via the vectorized Pandas UDF
    path (numpy matrix multiply per group — the Arrow fast path; the
    synthetic embeddings have no true near-dups, so the check targets the
    scoring math itself). avg rounds to 3dp: numpy pairwise-mean vs
    DuckDB's sequential sum agree to ~1e-12, far inside 3dp."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.label_cosine_stats(emb)
    return out.select(
        "label", "n_pairs",
        (F.round("max_cosine", 4) + F.lit(0.0)).alias("max_cosine"),
        (F.round("avg_cosine", 3) + F.lit(0.0)).alias("avg_cosine"))


SQL_EMBEDDING_LABEL_STATS = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings)
SELECT a.label, count(*) AS n_pairs,
       round(max(list_cosine_similarity(a.v, b.v)), 4) + 0.0 AS max_cosine,
       round(avg(list_cosine_similarity(a.v, b.v)), 3) + 0.0 AS avg_cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
GROUP BY a.label
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


SQL_TEXT_LANGID = r"""
WITH padded AS (
  SELECT doc_id, lang, lower(text) AS t FROM documents
), scores AS (
  SELECT doc_id, lang, 'de' AS cand,
         len(list_filter(str_split_regex(t, '\s+'),
             x -> list_contains(['der', 'die', 'und', 'das', 'ist', 'von', 'mit', 'den', 'ein', 'zu'], x))) AS hits FROM padded
  UNION ALL
  SELECT doc_id, lang, 'en',
         len(list_filter(str_split_regex(t, '\s+'),
             x -> list_contains(['the', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'was', 'for'], x))) FROM padded
  UNION ALL
  SELECT doc_id, lang, 'es',
         len(list_filter(str_split_regex(t, '\s+'),
             x -> list_contains(['el', 'la', 'de', 'que', 'y', 'en', 'un', 'por', 'con', 'los'], x))) FROM padded
  UNION ALL
  SELECT doc_id, lang, 'fr',
         len(list_filter(str_split_regex(t, '\s+'),
             x -> list_contains(['le', 'la', 'de', 'et', 'les', 'des', 'est', 'dans', 'que', 'pour'], x))) FROM padded
  UNION ALL
  SELECT doc_id, lang, 'zh',
         len(list_filter(str_split_regex(t, '\s+'),
             x -> list_contains(['的', '是', '在', '了', '和', '有', '我', '不', '人', '这'], x))) FROM padded
), best AS (
  SELECT doc_id, lang, cand, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand DESC) AS rn
  FROM scores
)
SELECT doc_id, lang,
       CASE WHEN hits > 0 THEN cand ELSE 'und' END AS lang_pred
FROM best WHERE rn = 1
"""


def q_streaming_windowed_counts(spark, sf_dir):
    """End-to-end Structured Streaming: file-stream the events table,
    watermarked 1-hour tumbling windows (streaming.windowed_aggregate),
    drain with availableNow into a memory sink, return the final result.
    The streaming output is deterministic, so the ORACLE IS PLAIN BATCH
    SQL — stream/batch consistency is the check."""
    import uuid

    from kiji_mapreduce_spark.streaming import windowed_aggregate

    static = _t(spark, sf_dir, "events")
    # the file-stream source wants a directory: stream the sf_dir with a
    # glob pinned to the events file
    stream = (spark.readStream.schema(static.schema)
              .format("parquet")
              .option("pathGlobFilter", "events.parquet")
              .load(sf_dir))
    ts_type = dict(static.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        # nanos-as-long needs caller knowledge of the unit; the NTZ case
        # is owned by the job-level _ensure_event_time coercion
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = windowed_aggregate(
        stream, "ts", "1 hour", "2 hours", group_cols=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n_events"),
              F.round(F.sum("value"), 2).alias("sum_value")])
    qname = f"stream_win_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(qname).trigger(availableNow=True).start())
    q.awaitTermination(300)
    out = spark.table(qname)
    # window.start is TIMESTAMP already: _ensure_event_time (inside
    # windowed_aggregate) owns the NTZ coercion, and the long/nanos case
    # was converted above — no suite-level cast needed (ADVICE r3)
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "event_type", "n_events", "sum_value")


SQL_STREAMING_WINDOWED = """
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def q_weighted_sample(spark, sf_dir):
    """Efraimidis–Spirakis weighted sampling without replacement
    (``sample.weighted_sample_topk``): 10 documents per language with
    inclusion probability proportional to token count, selected by
    deterministic exponential clocks. Oracle: the same -ln(u)/w ranking
    in DuckDB (u is the shared md5 unit hash, so both engines draw the
    SAME clocks)."""
    docs = _t(spark, sf_dir, "documents")
    docs = docs.withColumn(
        "n_tokens", text_ops.token_count(F.col("text")).cast("long"))
    out = sample.weighted_sample_topk(
        docs, strata_col="lang", weight_col="n_tokens", k=10,
        key_col="doc_id", seed=11)
    return out.select("lang", F.col("rank").cast("long").alias("rank"),
                      "doc_id", "n_tokens")


SQL_WEIGHTED_SAMPLE = r"""
WITH d AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         ('0x' || substr(md5('11|' || doc_id::VARCHAR), 1, 15))::BIGINT
           AS h
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         -ln((h + 1) / 1152921504606846976.0) / n_tokens AS clock
  FROM d WHERE n_tokens > 0),
r AS (
  SELECT lang, doc_id, n_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY clock, doc_id) AS rank
  FROM c)
SELECT lang, rank, doc_id, n_tokens FROM r WHERE rank <= 10
"""


def q_kmv_distinct_users(spark, sf_dir):
    """KMV distinct-count sketch (``sketch.kmv_distinct``): estimated
    distinct users per event type from the 64 minimum md5 hashes —
    deterministic, so the ORACLE RECOMPUTES THE SAME SKETCH in DuckDB
    (engine-specific HLLs could never hash-match)."""
    ev = _t(spark, sf_dir, "events")
    return sketch.kmv_distinct(ev, "event_type", "user_id", k=64)


SQL_KMV_DISTINCT = """
WITH e AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM e),
a AS (
  SELECT event_type, count(*) AS n_sketch, max(h) AS kth_hash
  FROM r WHERE rk <= 64 GROUP BY event_type)
SELECT event_type, n_sketch, kth_hash,
       round(CASE WHEN n_sketch < 64 THEN n_sketch * 1.0
                  ELSE 63 / (kth_hash / 1152921504606846976.0) END,
             2) AS estimate
FROM a
"""


def q_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters (``sketch.countmin_table`` +
    ``countmin_estimates``): a 4x512 CMS over document tokens, probed
    with the exact top-20 tokens so the output exposes estimate vs
    truth (estimate >= exact always; equality when no bucket
    collision). md5 hash mode makes the sketch a pure function DuckDB
    reproduces cell-for-cell — the ORACLE REBUILDS THE WHOLE SKETCH."""
    docs = _t(spark, sf_dir, "documents")
    # ONE corpus tokenization + count; the (vocab-sized) count table is
    # checkpointed and feeds both the sketch (as weights) and the exact
    # top-20 — the naive form scanned and shuffled the corpus twice
    counts = (docs.select(
        F.explode(dedup.tokens(F.col("text"))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint())
    cms = sketch.countmin_table(
        counts, "token", depth=4, width=512, hash_fn="md5",
        weight_col="exact_cnt")
    top = (counts.orderBy(F.col("exact_cnt").desc(), F.col("token"))
           .limit(20))
    est = sketch.countmin_estimates(
        cms, top, "token", depth=4, width=512, hash_fn="md5")
    return est.select("token", "exact_cnt", "cms_estimate")


SQL_COUNTMIN_HEAVY_HITTERS = r"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents),
counts AS (
  SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
rows_ AS (SELECT unnest(range(0, 4)) AS cm_row),
cells AS (
  SELECT cm_row,
         ('0x' || substr(md5(token || '|' || cm_row), 1, 15))::BIGINT
           % 512 AS cm_bucket,
         sum(cnt)::BIGINT AS cm_count
  FROM counts CROSS JOIN rows_ GROUP BY 1, 2),
top AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 20)
SELECT t.token, t.cnt AS exact_cnt, min(c.cm_count)::BIGINT AS cms_estimate
FROM top t CROSS JOIN rows_ r
JOIN cells c
  ON c.cm_row = r.cm_row
 AND c.cm_bucket = ('0x' || substr(md5(t.token || '|' || r.cm_row), 1, 15))
                     ::BIGINT % 512
GROUP BY 1, 2
"""


def q_hard_negative_mining(spark, sf_dir):
    """Contrastive hard-negative mining (``similarity.hard_negative_topk``):
    for each of 5 labeled anchors, the top-5 most-cosine-similar vectors
    with a DIFFERENT label — broadcast anchors, one corpus scan, label
    mismatch applied as the join predicate. Oracle: the knn SQL with the
    label filter."""
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 5)
    out = similarity.hard_negative_topk(emb, anchors, k=5)
    return out.select(
        "query_id", "query_label", "neighbor_id", "neighbor_label",
        (F.round("cosine", 4) + F.lit(0.0)).alias("cosine"), "rank")


SQL_HARD_NEGATIVE_MINING = """
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label,
         CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
         e.label AS neighbor_label,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
    AND NOT (e.label IS NOT NULL AND q.query_label IS NOT NULL
             AND e.label = q.query_label)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label,
       round(cos, 4) + 0.0 AS cosine, rank
FROM ranked WHERE rank <= 5
"""


def q_mixture_temperature(spark, sf_dir):
    """Temperature-based mixture rebalancing (``sample.mixture_weights``
    with ``temperature=0.7``): per-source keep probabilities from
    ``share^(1/T)`` renormalized — the standard multilingual data
    balancing knob. Oracle: the same pow/window arithmetic in DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return sample.mixture_weights(docs, "source", temperature=0.7)


SQL_MIXTURE_TEMPERATURE = r"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source),
s AS (
  SELECT *, n_tokens * 1.0 / sum(n_tokens) OVER () AS share FROM per),
t AS (
  SELECT *,
         pow(share, 1.0 / 0.7) / sum(pow(share, 1.0 / 0.7)) OVER () AS tgt
  FROM s),
r AS (SELECT *, tgt / share AS raw FROM t)
SELECT source, n_docs, n_tokens, round(share, 4) AS token_share,
       round(raw / max(raw) OVER (), 4) AS sample_weight
FROM r
"""


def q_text_chunking(spark, sf_dir):
    """Token-window chunking with overlap (``text.chunk_documents``) —
    the context-window / RAG-prep operator: 64-token chunks, stride 48
    (16-token overlap). Oracle: the same slicing arithmetic over
    DuckDB's ``regexp_extract_all`` token lists."""
    docs = _t(spark, sf_dir, "documents")
    return text_ops.chunk_documents(
        docs, chunk_tokens=64, stride=48).select(
        "doc_id", "chunk_id", "chunk_text", "n_tokens")


SQL_TEXT_CHUNKING = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk,
         len(regexp_extract_all(text, '\S+')) AS n
  FROM documents),
c AS (
  SELECT doc_id, tk, n,
         CASE WHEN n <= 64 THEN 1
              ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END AS nc
  FROM t WHERE n > 0),
e AS (
  SELECT doc_id, tk, n, unnest(range(0, nc)) AS chunk_id FROM c)
SELECT doc_id, chunk_id,
       array_to_string(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64],
                       ' ') AS chunk_text,
       least(n - chunk_id * 48, 64) AS n_tokens
FROM e
"""


def q_streaming_sessionize(spark, sf_dir):
    """Streaming sessionization: per-user session windows with a
    30-minute inactivity gap over the file-streamed events table
    (``streaming.sessionized_aggregate`` — watermark-bounded session
    state). availableNow drains deterministically and the ORACLE IS THE
    BATCH SESSIONIZATION SQL — stream/batch consistency is the check."""
    import uuid

    from kiji_mapreduce_spark.streaming import sessionized_aggregate
    from kiji_mapreduce_spark.streaming.jobs import _ensure_event_time

    static = _t(spark, sf_dir, "events")
    stream = (spark.readStream.schema(static.schema)
              .format("parquet")
              .option("pathGlobFilter", "events.parquet")
              .load(sf_dir))
    ts_type = dict(static.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    # truncate to ms BEFORE sessionizing so gap decisions match the
    # oracle's epoch_ms arithmetic (same normalization as the batch
    # q_sessionize_events); coercion first — unix_millis rejects NTZ
    stream = _ensure_event_time(stream, "ts")
    stream = stream.withColumn("ts", F.timestamp_millis(F.unix_millis("ts")))
    agg = sessionized_aggregate(
        stream, "ts", gap="30 minutes", watermark="2 hours",
        group_cols=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"),
              F.round(F.sum("value"), 2).alias("session_value")])
    qname = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(qname).trigger(availableNow=True).start())
    q.awaitTermination(300)
    out = spark.table(qname)
    return out.select(
        "user_id",
        F.unix_millis(F.col("session_window.start"))
        .alias("session_start_ms"),
        "n_events", "session_value")


def q_pack_documents(spark, sf_dir):
    """Sequence packing: deterministic hash order per (source, shard),
    cumulative token counts chunked into 512-token packs. 4 shards per
    source keep the windows parallel (a straggler-avoidance shape that
    matters at 100 TB, exercised here)."""
    docs = _t(spark, sf_dir, "documents")
    out = sample.pack_documents(
        docs, budget=512, n_shards=4, seed=42, hash_fn="md5")
    # bigint to match the oracle's window-sum type discipline
    return out.withColumn("n_tokens", F.col("n_tokens").cast("long"))


SQL_PACK_DOCUMENTS = r"""
WITH base AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 10000 AS u,
         ('0x' || substr(md5('shard42|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 4 AS shard
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens, shard,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY u, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS before
  FROM base
)
SELECT doc_id, source, n_tokens, shard,
       floor(before / 512)::BIGINT AS pack_id,
       before % 512 AS pack_offset
FROM c
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


# decomposed E + combining acute (NFC must recompose it), double spaces
# (the collapse must fold them), fullwidth A (Unicode lower must map it)
_NFC_SUFFIX = "  CAFE\u0301  \uFF21  "


def q_text_normalize(spark, sf_dir):
    """Unicode NFC + lower + whitespace-collapse normalization. A
    combining-sequence suffix (see ``_NFC_SUFFIX``) is appended so NFC
    provably recomposes — the documents themselves are ASCII.
    Digest-compared against DuckDB's nfc_normalize."""
    docs = _t(spark, sf_dir, "documents")
    suffixed = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(_NFC_SUFFIX)).alias("text"))
    return text_ops.normalize_text(suffixed).select(
        "doc_id", F.md5("text_norm").alias("norm_digest"),
        F.length("text_norm").alias("norm_len"))


SQL_TEXT_NORMALIZE = f"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(nfc_normalize(
           text || '{_NFC_SUFFIX}')), '\\s+', ' ', 'g')))
         AS norm_digest,
       length(trim(regexp_replace(lower(nfc_normalize(
           text || '{_NFC_SUFFIX}')), '\\s+', ' ', 'g')))
         AS norm_len
FROM documents
"""


def q_streaming_dedup_docs(spark, sf_dir):
    """Streaming exact dedup of a document stream: watermarked
    first-seen-wins on the content digest
    (``dropDuplicatesWithinWatermark`` — state bounded by the horizon,
    not corpus size). Which physical row survives a duplicate group is
    arbitrary, so the query emits only digest-determined columns; the
    oracle is the batch DISTINCT — stream/batch consistency is the
    check."""
    import uuid

    from kiji_mapreduce_spark.streaming import stream_dedup_exact

    static = _t(spark, sf_dir, "documents")
    stream = (spark.readStream.schema(static.schema)
              .format("parquet")
              .option("pathGlobFilter", "documents.parquet")
              .load(sf_dir))
    # synthetic event time for the watermark (documents carry none);
    # offset from epoch: the initial watermark is epoch 0 and an event
    # time of exactly 0 (doc_id=0) would be dropped as late
    stream = stream.withColumn(
        "_ts", F.timestamp_micros(F.col("doc_id") + F.lit(86_400_000_000)))
    deduped = stream_dedup_exact(stream, ts_col="_ts")
    qname = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName(qname).trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.table(qname).select(
        "digest", F.length("text").alias("n_chars_txt"))


SQL_STREAMING_DEDUP = """
SELECT DISTINCT md5(text) AS digest, length(text) AS n_chars_txt
FROM documents
"""


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


def q_snapshot_diff_orders(spark, sf_dir):
    """CDC-style snapshot diff (functions.snapshot_diff): classify rows
    as inserted/deleted/updated between two deterministic variants of
    the orders table. One full-outer join on the key; change detection
    is a JVM-side xxhash64 over the compared columns."""
    from kiji_mapreduce_spark.functions import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    before = (o.filter(F.col("o_orderkey") % 97 != 0)
              .select("o_orderkey", "o_totalprice"))
    after = (o.filter(F.col("o_orderkey") % 89 != 0)
             .select("o_orderkey",
                     F.when(F.col("o_orderkey") % 13 == 0,
                            F.col("o_totalprice") + F.lit(1.0))
                     .otherwise(F.col("o_totalprice"))
                     .alias("o_totalprice")))
    d = snapshot_diff(before, after, ["o_orderkey"], ["o_totalprice"])
    return (d.groupBy("change")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("o_orderkey").cast("long").alias("key_checksum")))


SQL_SNAPSHOT_DIFF_ORDERS = """
WITH before_s AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 != 0),
after_s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 89 != 0),
d AS (
  SELECT coalesce(b.o_orderkey, a.o_orderkey) AS k,
         CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
              WHEN a.o_orderkey IS NULL THEN 'deleted'
              WHEN b.o_totalprice <> a.o_totalprice THEN 'updated'
         END AS change
  FROM before_s b FULL OUTER JOIN after_s a
    ON b.o_orderkey = a.o_orderkey)
SELECT change, count(*) AS n_rows,
       CAST(sum(k) AS BIGINT) AS key_checksum
FROM d WHERE change IS NOT NULL GROUP BY change
"""


def q_data_quality_audit(spark, sf_dir):
    """Data-quality expectations (audit module): one-pass column
    profiles (nulls, exact distincts, min/max) plus referential-orphan
    counts, unioned into one (check_name, subject, value) report — the
    promotion gate a pipeline runs before publishing a snapshot."""
    from kiji_mapreduce_spark.audit import (
        audit_union, column_profile, fk_orphans)

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    return audit_union([
        column_profile(orders, "orders", ["o_custkey", "o_totalprice"]),
        fk_orphans(orders, customer, "o_custkey", "c_custkey",
                   "orders.o_custkey->customer.c_custkey"),
        fk_orphans(lineitem, orders, "l_orderkey", "o_orderkey",
                   "lineitem.l_orderkey->orders.o_orderkey"),
    ])


SQL_DATA_QUALITY_AUDIT = """
SELECT 'n_rows' AS check_name, 'orders' AS subject,
       CAST(count(*) AS DOUBLE) AS value FROM orders
UNION ALL SELECT 'n_nulls', 'orders.o_custkey',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       FROM orders
UNION ALL SELECT 'n_distinct', 'orders.o_custkey',
       CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders
UNION ALL SELECT 'min', 'orders.o_custkey',
       CAST(min(o_custkey) AS DOUBLE) FROM orders
UNION ALL SELECT 'max', 'orders.o_custkey',
       CAST(max(o_custkey) AS DOUBLE) FROM orders
UNION ALL SELECT 'n_nulls', 'orders.o_totalprice',
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS DOUBLE) FROM orders
UNION ALL SELECT 'n_distinct', 'orders.o_totalprice',
       CAST(count(DISTINCT o_totalprice) AS DOUBLE) FROM orders
UNION ALL SELECT 'min', 'orders.o_totalprice',
       CAST(min(o_totalprice) AS DOUBLE) FROM orders
UNION ALL SELECT 'max', 'orders.o_totalprice',
       CAST(max(o_totalprice) AS DOUBLE) FROM orders
UNION ALL SELECT 'fk_orphans', 'orders.o_custkey->customer.c_custkey',
       CAST(count(*) AS DOUBLE) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey)
UNION ALL SELECT 'fk_orphans', 'lineitem.l_orderkey->orders.o_orderkey',
       CAST(count(*) AS DOUBLE) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey)
"""


def q_sessionize_events(spark, sf_dir):
    """Sessionization: per-user sessions with a 30-minute inactivity gap
    via ``session_window`` (the batch form of the streaming session
    operator). Oracle: the classic lag/cumsum sessionization in SQL."""
    ev = _events(spark, sf_dir)
    # truncate to ms so boundary decisions match the oracle's epoch_ms math
    ev = ev.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start"))
            .alias("session_start_ms"),
            "n_events", "session_value")
    )


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                   OR lag(epoch_ms(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))
), s AS (
  SELECT user_id, ts_ms, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_ms
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id, min(ts_ms) AS session_start_ms,
       count(*) AS n_events, round(sum(value), 2) AS session_value
FROM s GROUP BY user_id, session_id
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
    emb = _t(spark, sf_dir, "embeddings")
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
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    # checkpoint stands in for the production persisted index table —
    # minhash_dedup_incremental reads it twice (band entries + verify
    # sets), and the steady state never recomputes it from text
    index = dedup.minhash_index(corpus, hash_fn="md5") \
        .localCheckpoint(eager=True)
    pairs = dedup.minhash_dedup_incremental(
        new, index, threshold=0.5, hash_fn="md5")
    return pairs.select("id_a", "id_b",
                        F.round("jaccard", 6).alias("jaccard"))


def q_text_langid(spark, sf_dir):
    """Stopword-vote language id (oracle: the same vote in SQL)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        text_ops.language_id(F.col("text")).alias("lang_pred"))


def q_text_fingerprint(spark, sf_dir):
    """Winnowing-style rolling-hash fingerprint, oracle-checked: the
    md5-mode token hash makes the rolling polynomial reproducible in
    DuckDB (``oracles.fingerprint_sql``). Uses the posexplode+window
    form (codegen'd)."""
    docs = _t(spark, sf_dir, "documents")
    return text_ops.fingerprints(docs, hash_fn="md5")


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals: character mass of the
    most-repeated word 2-/3-gram and of duplicated 5-grams, over the
    normalized doc length. One explode + one (id, n, gram) count agg."""
    docs = _t(spark, sf_dir, "documents")
    return text_ops.repetition_features(docs, top_ns=(2, 3), dup_ns=(5,))


SQL_TEXT_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
norm AS (
  SELECT doc_id,
         list_sum(list_transform(t, x -> length(x))) + len(t) - 1 AS norm_len
  FROM toks WHERE len(t) >= 1
),
g AS (
  SELECT doc_id, n,
         unnest(list_transform(range(1, len(t) - n + 2),
                i -> array_to_string(t[i : i + n - 1], ' '))) AS gram
  FROM toks, (VALUES (2), (3), (5)) v(n)
  WHERE len(t) >= n
),
c AS (
  SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram
),
m AS (
  -- top_mass = char mass of the most-FREQUENT gram (count dominates the
  -- composite key; mass breaks count ties) — mirrors repetition_features
  SELECT doc_id, n,
         max(c * 100000000 + c * length(gram)) % 100000000 AS top_mass,
         coalesce(sum(CASE WHEN c >= 2 THEN c * length(gram) END), 0)
           AS dup_mass
  FROM c GROUP BY doc_id, n
),
wide AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN top_mass END) AS top2,
         max(CASE WHEN n = 3 THEN top_mass END) AS top3,
         max(CASE WHEN n = 5 THEN dup_mass END) AS dup5
  FROM m GROUP BY doc_id
)
SELECT norm.doc_id,
       round(coalesce(top2, 0) / norm_len, 4) AS top2_frac,
       round(coalesce(top3, 0) / norm_len, 4) AS top3_frac,
       round(coalesce(dup5, 0) / norm_len, 4) AS dup5_frac
FROM norm LEFT JOIN wide ON norm.doc_id = wide.doc_id
"""


def q_text_pii(spark, sf_dir):
    """PII scrub: regex-count emails / phones / IPv4s and hash the
    typed-token redaction. The driver's customer table carries no contact
    columns, so deterministic PII is synthesized from the keys (email for
    every 3rd customer, phone every 2nd, IP every 5th) — giving the
    patterns real positive AND negative rows; patterns are
    Java-regex/RE2-identical so the scrub is oracle-checkable."""
    cust = _t(spark, sf_dir, "customer")
    key, nat = F.col("c_custkey"), F.col("c_nationkey")
    email = F.when(key % 3 == 0, F.concat(
        F.lower(F.regexp_replace("c_name", r"[^A-Za-z0-9]", ".")),
        F.lit("@example.com")))
    phone = F.when(key % 2 == 0, F.concat(
        F.lpad((nat % 100).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((key % 1000).cast("string"), 3, "0"), F.lit("-555-"),
        F.lpad((key % 10000).cast("string"), 4, "0")))
    ip = F.when(key % 5 == 0, F.concat(
        (key % 256).cast("string"), F.lit("."),
        (nat % 256).cast("string"), F.lit(".0.1")))
    blob = cust.select(
        "c_custkey",
        F.concat_ws(" ", F.col("c_name"), F.col("c_mktsegment"),
                    email, phone, ip).alias("text"))
    return text_ops.pii_features(blob).select(
        "c_custkey", "n_emails", "n_phones", "n_ipv4",
        F.md5("redacted").alias("redacted_digest"), "has_pii")


SQL_TEXT_PII = r"""
WITH blob AS (
  SELECT c_custkey,
         concat_ws(' ', c_name, c_mktsegment,
           CASE WHEN c_custkey % 3 = 0 THEN
             lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g'))
             || '@example.com' END,
           CASE WHEN c_custkey % 2 = 0 THEN
             lpad((c_nationkey % 100)::VARCHAR, 2, '0') || '-'
             || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-555-'
             || lpad((c_custkey % 10000)::VARCHAR, 4, '0') END,
           CASE WHEN c_custkey % 5 = 0 THEN
             (c_custkey % 256)::VARCHAR || '.'
             || (c_nationkey % 256)::VARCHAR || '.0.1' END) AS text
  FROM customer
)
SELECT c_custkey,
  len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
  len(regexp_extract_all(text,
      '\b(?:\d{2,3}[- ])?\d{3}[- ]\d{3}[- ]\d{4}\b')) AS n_phones,
  len(regexp_extract_all(text,
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
  md5(regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\b(?:\d{2,3}[- ])?\d{3}[- ]\d{3}[- ]\d{4}\b', '[PHONE]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g'))
    AS redacted_digest,
  (len(regexp_extract_all(text,
       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
   + len(regexp_extract_all(text,
       '\b(?:\d{2,3}[- ])?\d{3}[- ]\d{3}[- ]\d{4}\b'))
   + len(regexp_extract_all(text,
       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) > 0 AS has_pii
FROM blob
"""


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


def q_pagerank_nation_trade(spark, sf_dir):
    """Fixed-iteration weighted PageRank over the nation trade graph
    (supplier nation -> customer nation, weight = lineitem count): the
    canonical iterative MapReduce computation on an edge table that a
    5-way join aggregates down from the fact data — the loop itself
    never touches a fact row. Per-round rank rounding pins both engines
    to one grid, so the oracle is exact, not epsilon-based."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    sn = nat.select(F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("src"))
    cn = nat.select(F.col("n_nationkey").alias("c_nk"),
                    F.col("n_name").alias("dst"))
    edges = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .join(cust, orders.o_custkey == cust.c_custkey)
             .join(supp, li.l_suppkey == supp.s_suppkey)
             .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
             .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("w")))
    pr = graph.pagerank(edges, "src", "dst", weight="w",
                        damping=0.85, iters=5)
    return pr.select(F.col("node").alias("nation"),
                     F.round(F.col("rank"), 6).alias("pagerank"))


def q_streaming_interval_join(spark, sf_dir):
    """Watermarked stream-stream interval join: purchases paired with
    the same user's clicks in the preceding 30 minutes, both sides
    file-streamed. The range bound is what keeps join state finite on
    an unbounded stream; availableNow drains deterministically, so the
    ORACLE IS THE BATCH JOIN — stream/batch consistency is the check."""
    import uuid

    from kiji_mapreduce_spark.streaming import stream_interval_join

    static = _t(spark, sf_dir, "events")

    def _stream():
        s = (spark.readStream.schema(static.schema)
             .format("parquet")
             .option("pathGlobFilter", "events.parquet")
             .load(sf_dir))
        ts_type = dict(static.dtypes)["ts"]
        if ts_type in ("bigint", "long"):
            # NTZ coercion is owned by stream_interval_join's
            # _ensure_event_time; only the long/nanos unit needs us
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return s

    purchases = _stream().filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id"), F.col("ts").alias("p_ts"))
    clicks = _stream().filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id"), F.col("ts").alias("c_ts"))
    joined = stream_interval_join(
        purchases, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts",
        lower="30 minutes", upper="0 seconds", watermark="1 hour")
    out = joined.select(
        "p_event_id", F.col("_r.c_event_id").alias("c_event_id"),
        F.col("_l.user_id").alias("user_id"),
        (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("gap_ms"))
    qname = f"stream_ij_{uuid.uuid4().hex[:8]}"
    # state-store partition count is fixed at stream start from
    # spark.sql.shuffle.partitions; size it to the stream's key volume
    # (join state = 2 stores x partitions, each with per-batch commit
    # overhead), not the batch shuffle default
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(qname).trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)


SQL_STREAMING_INTERVAL_JOIN = """
SELECT p.event_id AS p_event_id, c.event_id AS c_event_id,
       p.user_id AS user_id,
       epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
"""


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language Bernoulli sample by md5 key hash —
    membership is a pure function of (seed, doc_id), reproducible in any
    engine and under any partitioning. Filter-only: no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return sample.stratified_sample(
        docs, strata_col="lang", rates={"en": 0.5, "zh": 0.35},
        default_rate=0.2, seed=42, hash_fn="md5",
    ).select("doc_id", "lang", "source")


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang, source FROM documents
WHERE ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000
      < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 3500 ELSE 2000 END
"""


def q_sample_stratum_topk(spark, sf_dir):
    """Deterministic reservoir: exactly 3 docs per language — the 3
    smallest key hashes, stable under re-partitioning and re-runs."""
    docs = _t(spark, sf_dir, "documents")
    return sample.stratum_topk(
        docs, strata_col="lang", k=3, seed=42, hash_fn="md5",
    ).select("doc_id", "lang", "sample_rank")


SQL_SAMPLE_STRATUM_TOPK = """
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT
                    % 10000, doc_id) AS sample_rank
  FROM documents
) WHERE sample_rank <= 3
"""


def q_mixture_token_budget(spark, sf_dir):
    """Per-source token totals + the sampling weight that reshapes the
    corpus toward a uniform source mixture (largest weight pinned to 1):
    one grouped agg, windows over the tiny per-source result."""
    docs = _t(spark, sf_dir, "documents")
    return sample.mixture_weights(docs, group_col="source")


SQL_MIXTURE_TOKEN_BUDGET = r"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_docs, n_tokens,
         n_tokens / sum(n_tokens) OVER () AS share,
         (1.0 / count(*) OVER ()) / (n_tokens / sum(n_tokens) OVER ()) AS raw
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(share, 4) AS token_share,
       round(raw / max(raw) OVER (), 4) AS sample_weight
FROM s
"""


def q_quantiles_order_price(spark, sf_dir):
    """Exact interpolated percentiles per group (absent in the reference;
    both engines use the same linear-interpolation definition)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.95), 4).alias("p95"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"))


SQL_QUANTILES = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def q_grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS (finer control than rollup/cube)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders")
    )


SQL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def q_array_agg_priorities(spark, sf_dir):
    """Sorted array aggregation (collect_list -> deterministic array).

    The array is emitted joined to one string: the driver's canonicalizer
    sorts result rows with pandas, which cannot sort list-typed cells
    (round-1 CORRECTNESS err) — a joined string is the same value,
    hash-comparable."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderpriority")), ",")
        .alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"))


SQL_ARRAY_AGG = """
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderpriority)), ',') AS priorities,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


class _WordCountGatherer(Gatherer):
    """THE canonical MapReduce job as a Gatherer: tokenize -> emit ->
    count (reference KijiGatherer docs pattern)."""

    def gather_df(self, df, ctx):
        return df.select(F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("word"))

    def reduce_df(self, g, ctx):
        return g.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def q_wordcount_top50(spark, sf_dir):
    counts = _WordCountGatherer().compile(_t(spark, sf_dir, "documents"))
    return counts.orderBy(F.col("n").desc(), "word").limit(50)


SQL_WORDCOUNT = r"""
SELECT word, count(*) AS n
FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x != '')) AS word
      FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 50
"""


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF per (doc, term), top 3 terms per doc — the classic two-pass
    MapReduce workload as DataFrame ops (one explode, two aggregations,
    one broadcast-joined doc-frequency table)."""
    docs = _t(spark, sf_dir, "documents")
    # corpus size folded INTO the plan as a broadcast scalar (a driver-side
    # docs.count() would be a second full scan of documents at 100 TB)
    n_docs = F.broadcast(
        docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs")))
    terms = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.lower("text"), r"\s+"),
                           lambda t: t != "")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(dfreq), on="term").crossJoin(n_docs).select(
        "doc_id", "term",
        (F.col("tf") * F.log(F.col("_n_docs") / F.col("df")))
        .alias("_tfidf"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_tfidf").desc(), F.col("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "term",
                    F.round("_tfidf", 6).alias("tfidf"), "rnk"))


SQL_TFIDF = r"""
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / dfreq.df)
         AS tfidf_raw
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT doc_id, term, round(tfidf_raw, 6) AS tfidf, rnk FROM (
  SELECT doc_id, term, tfidf_raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_raw DESC, term) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


# fixed query set for the BM25 suite query — terms drawn from the
# synthetic documents vocabulary so every query matches
_BM25_QUERIES = [
    ("q1", "fast vector scan"),
    ("q2", "customer order join"),
    ("q3", "stream window agg"),
]


def q_bm25_search_topk(spark, sf_dir):
    """Okapi BM25 top-10 per query: postings from one explode+groupBy,
    corpus stats as a broadcast scalar, query terms broadcast against
    the postings; ranked on the 6-dp-rounded score so order matches the
    oracle bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    qs = spark.createDataFrame(_BM25_QUERIES,
                               "query_id string, query_text string")
    return search.bm25_topk(docs, qs, k=10)


def q_lm_bigram_quality(spark, sf_dir):
    """CCNet-style LM quality signal: add-0.1-smoothed bigram model
    trained on the corpus itself, every doc scored by mean token
    log-likelihood + perplexity (the model is a DataFrame — two
    aggregations — so a 100 TB reference trains with one shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.bigram_lm_scores(docs, alpha=0.1, hash_fn="md5")


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


SQL_BIG_SPENDERS = """
SELECT c_custkey, round(total, 2) AS total_spent
FROM (
  SELECT c_custkey, sum(o_totalprice) AS total
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
WHERE total > 2 * (SELECT avg(o_totalprice) FROM orders)
"""


def q_sql_surface_big_spenders(spark, sf_dir):
    """The SQL surface (SURVEY §7.1): tables registered as temp views and
    queried with the SAME portable ANSI text the oracle runs — scalar
    subquery + join + aggregation through spark.sql."""
    from kiji_mapreduce_spark.session import load_tables

    load_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(SQL_BIG_SPENDERS)


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing over real data: treat each document's UTF-8
    bytes as an opaque media blob, attach typed metadata, extract a
    deterministic fake embedding via the Arrow/mapInPandas path. Fully
    oracle-checked since r4: the fake feature is sha256-derived and
    DuckDB's sha256(VARCHAR) hashes the same UTF-8 bytes, so the oracle
    recomputes f0/f1 exactly from hex substrings."""
    from kiji_mapreduce_spark.pipeline import multimodal

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"))
    with_meta = multimodal.attach_media_meta(media, media_type="text/blob")
    feats = multimodal.extract_features(with_meta, dim=8)
    return feats.select(
        "media_id",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 2), 6).alias("f1"),
        F.size("feature").alias("dim"))


# the fake feature maps h = sha256(content || be32(0)) to floats via
# uint32_be(h[4i:4i+4]) / 2^31 - 1 (multimodal._fake_feature); dim=8
# needs only counter 0, so f0/f1 are the first two 4-byte windows
SQL_MULTIMODAL_FEATURES = """
WITH h AS (
  SELECT doc_id AS media_id,
         sha256(text || chr(0) || chr(0) || chr(0) || chr(0)) AS hx
  FROM documents
)
SELECT media_id,
       round(('0x' || substr(hx, 1, 8))::BIGINT / 2147483648.0 - 1.0, 6)
         AS f0,
       round(('0x' || substr(hx, 9, 8))::BIGINT / 2147483648.0 - 1.0, 6)
         AS f1,
       8 AS dim
FROM h
"""


def q_kmeans_clusters(spark, sf_dir):
    """Deterministic k-means over the embeddings table (semantic domain
    discovery for mixture design): centroids seeded from the 4 smallest
    ids, 2 Lloyd rounds, every centroid/distance rounded before
    comparison so the DuckDB oracle reproduces the argmin exactly.
    Corpus never shuffles for assignment (centroid literals in one
    codegen'd projection); the update shuffles k*dim partial means."""
    from kiji_mapreduce_spark.pipeline import cluster

    emb = _t(spark, sf_dir, "embeddings")
    return cluster.kmeans_assign(emb, k=4, iters=2)


# shared CTE chain: two deterministic Lloyd rounds (also the base of
# SQL_SAMPLE_CLUSTER_BALANCED)
_KMEANS_CTES = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, list_transform(v, x -> round(x, 6)) AS cv
  FROM e WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4)
),
a1 AS (
  SELECT vec_id, cid, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT e.vec_id, c.cid, round(list_distance(e.v, c.cv), 6) AS dist
        FROM e CROSS JOIN c0 c)
),
s1 AS (SELECT vec_id, cid AS cluster FROM a1 WHERE rn = 1),
u1 AS (
  SELECT s1.cluster, generate_subscripts(e.v, 1) AS ord,
         unnest(e.v) AS val
  FROM e JOIN s1 USING (vec_id)
),
c1 AS (
  SELECT cluster AS cid, list(round(m, 6) ORDER BY ord) AS cv
  FROM (SELECT cluster, ord, avg(val) AS m FROM u1 GROUP BY cluster, ord)
  GROUP BY cluster
),
a2 AS (
  SELECT vec_id, cid, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM (SELECT e.vec_id, c.cid, round(list_distance(e.v, c.cv), 6) AS dist
        FROM e CROSS JOIN c1 c)
)"""

SQL_KMEANS_CLUSTERS = _KMEANS_CTES + """
SELECT vec_id, cid AS cluster, round(dist, 4) AS dist
FROM a2 WHERE rn = 1
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


def q_sample_cluster_balanced(spark, sf_dir):
    """Cluster-balanced corpus sampling (SemDeDup-style diversity
    control): k-means the embeddings, then keyed-hash Bernoulli with a
    per-cluster rate targeting ~50 rows per cluster — over-represented
    semantic clusters are downsampled toward a uniform cluster mixture.
    Pure composition of two audited operators; membership is a
    deterministic function of the id alone."""
    from kiji_mapreduce_spark.pipeline import cluster, sample

    emb = _t(spark, sf_dir, "embeddings")
    assign = cluster.kmeans_assign(emb, k=4, iters=2).select(
        "vec_id", "cluster")
    out = sample.cluster_balanced_sample(
        emb.select("vec_id", "label"), assign, target_per_cluster=50,
        id_col="vec_id", seed=42, hash_fn="md5")
    return out.select("vec_id", "cluster", "label")


SQL_SAMPLE_CLUSTER_BALANCED = _KMEANS_CTES + """,
assign AS (SELECT vec_id, cid AS cluster FROM a2 WHERE rn = 1),
sz AS (SELECT cluster, count(*) AS n FROM assign GROUP BY cluster),
s AS (
  SELECT a.vec_id, a.cluster, emb.label,
         ('0x' || substr(md5('42|' || a.vec_id::VARCHAR), 1, 15))::BIGINT
           % 10000 AS u,
         least(10000, (50 * 10000) // sz.n) AS thr
  FROM assign a
  JOIN sz USING (cluster)
  JOIN embeddings emb USING (vec_id)
)
SELECT vec_id, cluster, label FROM s WHERE u < thr
"""


def q_knn_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate KNN, oracle-checked: the hyperplanes are
    literal constants, so DuckDB reproduces the buckets, candidate sets,
    and cosines exactly (``oracles.knn_lsh_sql``)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.lsh_topk(emb, queries, k=5, n_planes=4)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", 6).alias("cosine"), "rank")


def q_knn_ivf_topk(spark, sf_dir):
    """IVF approximate KNN with deterministic centroids (the vectors of
    the 8 lowest vec_ids — FAISS's pre-trained-quantizer mode), making
    cell assignment and probing reproducible in DuckDB
    (``oracles.knn_ivf_sql``). The KMeans-fit path stays the default for
    production use; this query exercises the probe machinery."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    w = Window.orderBy("vec_id")
    cents = (emb.orderBy("vec_id").limit(8)
             .select((F.row_number().over(w) - 1).alias("_cell"),
                     similarity.as_double(F.col("embedding")).alias("_center")))
    out = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, nprobe=2, centroids=cents)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", 6).alias("cosine"), "rank")


def q_knn_pq_topk(spark, sf_dir):
    """Product-quantization approximate KNN: corpus scanned as 8
    uint-codes per row (ADC table lookups, no full-dim arithmetic on
    the big side), approx top-20 re-ranked by exact cosine to top-5.
    Deterministic codebooks — per-subspace slices of the 16 lowest
    vec_id vectors (the pre-trained-quantizer mode) — make encode,
    ADC, and re-rank reproducible in DuckDB (``oracles.knn_pq_sql``);
    ``fit_pq_codebooks`` (per-subspace KMeans) stays the production
    fit path, exercised in pytest."""
    n_subspaces, n_codes = 8, 16
    emb = _t(spark, sf_dir, "embeddings")
    first = emb.orderBy("vec_id").limit(n_codes).collect()  # 16 rows
    dim = len(first[0]["embedding"])
    ds = dim // n_subspaces
    books = [[[float(x) for x in r["embedding"][m * ds:(m + 1) * ds]]
              for r in first] for m in range(n_subspaces)]
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.pq_topk(
        emb, queries, k=5, n_subspaces=n_subspaces, n_codes=n_codes,
        refine=4, codebooks=books)


def q_classifier_score_topk(spark, sf_dir):
    """Learned-quality-gate scoring with a FIXED literal weight vector:
    sigmoid of a dot product over md5-hashed L1-tf features, top-20 docs
    by probability. The weights ``w[i] = ((i*37) % 21 - 10) / 10`` are a
    deterministic formula both engines can generate, so the whole
    scoring join — the exact plan ``score_logreg`` runs with TRAINED
    weights — gets a driver hash (the train loop itself stays
    pytest-vs-numpy, r5 verdict ask #6)."""
    import numpy as np

    docs = _t(spark, sf_dir, "documents")
    feats = classifier.hashed_features(docs, dim=64, hash_fn="md5")
    w = np.array([((i * 37) % 21 - 10) / 10.0 for i in range(64)])
    scored = classifier.score_logreg(feats, w, bias=0.25)
    top = (scored.orderBy(F.col("prob").desc(), F.col("doc_id"))
           .limit(20))
    rank_w = Window.orderBy(F.col("prob").desc(), F.col("doc_id"))
    return top.select("doc_id", "prob",
                      F.row_number().over(rank_w).alias("rank"))


SQL_CLASSIFIER_SCORE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), feat AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS feature_idx,
         count(*)::DOUBLE AS cnt
  FROM toks GROUP BY 1, 2
), norm AS (
  SELECT doc_id, feature_idx,
         cnt / sum(cnt) OVER (PARTITION BY doc_id) AS value
  FROM feat
), wt AS (
  SELECT i AS feature_idx, ((i * 37) % 21 - 10) / 10.0 AS w
  FROM range(0, 64) t(i)
), prob AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(sum(value * w) + 0.25))), 6) AS prob
  FROM norm JOIN wt USING (feature_idx)
  GROUP BY doc_id
)
SELECT doc_id, prob, rank FROM (
  SELECT doc_id, prob,
         row_number() OVER (ORDER BY prob DESC, doc_id) AS rank
  FROM prob
) WHERE rank <= 20
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# NOTE on ordering: the driver's correctness harness checks the FIRST 50
# entries of this dict. Ordering policy (r4 verdict ask #1): queries whose
# code changed this round go FIRST, then the queries whose last oracle row
# is oldest, then the freshest-verified fill the rest; the tail holds only
# queries green in the IMMEDIATELY previous round, so every registry query
# is oracle-fresh within two rounds. New queries must be added INSIDE the
# first-50 window until they earn a green row. Freshness is now a COMMITTED
# LEDGER, not comment discipline: tools/update_verified.py regenerates
# VERIFIED.json from the CORRECTNESS_r*.json pile, and
# tests/test_suite_smoke.py::test_verification_ledger_freshness fails when
# any query 2+ rounds stale (or never verified) sits outside this window
# (r5 verdict ask #1).
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- NEW in r6: oracle row for the classifier scoring join (the one
    #    learned-gate path that was pytest-only) --
    "classifier_score_topk": q_classifier_score_topk,
    # -- changed in r6 (bitmask single-pass language scoring; simhash
    #    filter-before-distinct) --
    "text_langid": q_text_langid,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    # -- last driver-green r2: the r5 eviction's promised first slot --
    "dedup_source_matrix": q_dedup_source_matrix,
    # -- r4-green tail rotation, r5-changed ANN queries first
    #    (knn_ivf/knn_lsh took the norm-reuse refactor outside the r5
    #    window — ADVICE r5) --
    "knn_ivf_topk": q_knn_ivf_topk,
    "knn_lsh_topk": q_knn_lsh_topk,
    "knn_pq_topk": q_knn_pq_topk,
    "cell_rewrite_int_to_long": q_cell_rewrite_int_to_long,
    "lm_bigram_quality": q_lm_bigram_quality,
    "streaming_dedup_docs": q_streaming_dedup_docs,
    "bm25_search_topk": q_bm25_search_topk,
    "text_normalize": q_text_normalize,
    "sample_stratified": q_sample_stratified,
    "sample_stratum_topk": q_sample_stratum_topk,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "mixture_token_budget": q_mixture_token_budget,
    "pack_documents": q_pack_documents,
    "kmeans_clusters": q_kmeans_clusters,
    "salted_topk_events": q_salted_topk_events,
    "sample_cluster_balanced": q_sample_cluster_balanced,
    "gather_pricing_summary": q_gather_pricing_summary,
    "filter_pushdown_revenue": q_filter_pushdown_revenue,
    "kvstore_lookup_join": q_kvstore_lookup_join,
    "semi_join_customers_with_orders": q_semi_join_customers_with_orders,
    "anti_join_customers_without_orders": q_anti_join_customers_without_orders,
    "join_revenue_by_nation": q_join_revenue_by_nation,
    "producer_price_band": q_producer_price_band,
    "pivot_orders_by_customer": q_pivot_orders_by_customer,
    "bulk_import_props": q_bulk_import_props,
    "window_top3_orders_per_customer": q_window_top3_orders_per_customer,
    "set_ops_nations": q_set_ops_nations,
    "rollup_revenue": q_rollup_revenue,
    "mapreduce_event_stats": q_mapreduce_event_stats,
    "topk_shipping_priority": q_topk_shipping_priority,
    "union_all_parties": q_union_all_parties,
    "cube_order_stats": q_cube_order_stats,
    "distinct_segments": q_distinct_segments,
    "text_byte_stats": q_text_byte_stats,
    "window_running_revenue": q_window_running_revenue,
    # -- r5-green fill: same modules as this round's code changes
    #    (text.py langid rewrite, dedup.py simhash reorder, sketch.py
    #    Bloom two-level OR) --
    "text_token_count": q_text_token_count,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_chunking": q_text_chunking,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_pairs": q_dedup_minhash_pairs,
    "dedup_corpus_survivors": q_dedup_corpus_survivors,
    "dedup_incremental_pairs": q_dedup_incremental_pairs,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "countmin_heavy_hitters": q_countmin_heavy_hitters,
    "kmv_distinct_users": q_kmv_distinct_users,
    # ---- window boundary (driver verifies the 50 entries above;
    #      tests/test_suite_smoke.py::test_window_boundary_comment pins
    #      this comment to position 50) ----
    # -- tail: ALL r5-green (CORRECTNESS_r05 50/50) — the ledger test
    #    enforces that nothing here ages past 2 rounds --
    "dedup_repeated_ngrams": q_dedup_repeated_ngrams,
    "pagerank_nation_trade": q_pagerank_nation_trade,
    "entity_resolution_blocked": q_entity_resolution,
    "streaming_sessionize": q_streaming_sessionize,
    "mixture_temperature": q_mixture_temperature,
    "weighted_sample_topk": q_weighted_sample,
    "hard_negative_mining": q_hard_negative_mining,
    "pipeline_curate": q_pipeline_curate,
    "decontaminate_overlap": q_decontaminate_overlap,
    "decontaminate_spans": q_decontaminate_spans,
    "streaming_windowed_counts": q_streaming_windowed_counts,
    "sessionize_events": q_sessionize_events,
    "kvstore_avro_file_join": q_kvstore_avro_file_join,
    "versioned_latest_event_value": q_versioned_latest_event_value,
    "versioned_slice_maxversions": q_versioned_slice_maxversions,
    "map_family_regex_filter": q_map_family_regex_filter,
    "entity_key_hash": q_entity_key_hash,
    "asof_join_purchase_click": q_asof_join_purchase_click,
    "range_join_price_bands": q_range_join_price_bands,
    "knn_cosine_topk": q_knn_cosine_topk,
    "embedding_label_cosine_stats": q_embedding_label_cosine_stats,
    "quantiles_order_price": q_quantiles_order_price,
    "sql_surface_big_spenders": q_sql_surface_big_spenders,
    "grouping_sets_orders": q_grouping_sets_orders,
    "wordcount_top50": q_wordcount_top50,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pivot_wide_event_values": q_pivot_wide_event_values,
    "array_agg_priorities": q_array_agg_priorities,
    "events_json_props": q_events_json_props,
    "timeseries_gapfill": q_timeseries_gapfill,
    "snapshot_diff_orders": q_snapshot_diff_orders,
    "data_quality_audit": q_data_quality_audit,
    "embedding_near_dups": q_embedding_near_dups,
    "text_repetition": q_text_repetition,
    "text_pii": q_text_pii,
    "multimodal_features": q_multimodal_features,
    "streaming_interval_join": q_streaming_interval_join,
}

#: Names that MUST sit inside the driver's first-50 verification window
#: this round: anything whose code changed in r6, the stale rotation
#: block (everything last green in r4 or earlier), and the new query.
#: Mechanically enforced by
#: tests/test_suite_smoke.py::test_first_window_membership — hand-ordered
#: dict entries alone proved too fragile (ADVICE r3).
FIRST_WINDOW_REQUIRED: list[str] = [
    # new in r6
    "classifier_score_topk",
    # changed in r6
    "text_langid",
    "dedup_simhash_pairs",
    # last driver-green r2
    "dedup_source_matrix",
    # r5-changed code, unwindowed in r5 (ADVICE r5: rotate first)
    "knn_ivf_topk",
    "knn_lsh_topk",
    "knn_pq_topk",
    # r4-green tail rotation
    "cell_rewrite_int_to_long",
    "lm_bigram_quality",
    "streaming_dedup_docs",
    "bm25_search_topk",
    "text_normalize",
    "sample_stratified",
    "sample_stratum_topk",
    "events_anomaly_zscore",
    "mixture_token_budget",
    "pack_documents",
    "kmeans_clusters",
    "salted_topk_events",
    "sample_cluster_balanced",
    "gather_pricing_summary",
    "filter_pushdown_revenue",
    "kvstore_lookup_join",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "join_revenue_by_nation",
    "producer_price_band",
    "pivot_orders_by_customer",
    "bulk_import_props",
    "window_top3_orders_per_customer",
    "set_ops_nations",
    "rollup_revenue",
    "mapreduce_event_stats",
    "topk_shipping_priority",
    "union_all_parties",
    "cube_order_stats",
    "distinct_segments",
    "text_byte_stats",
    "window_running_revenue",
]

ORACLES: dict[str, str] = {
    "classifier_score_topk": SQL_CLASSIFIER_SCORE,
    "entity_resolution_blocked": SQL_ENTITY_RESOLUTION,
    "streaming_sessionize": SQL_SESSIONIZE,
    "text_chunking": SQL_TEXT_CHUNKING,
    "mixture_temperature": SQL_MIXTURE_TEMPERATURE,
    "kmv_distinct_users": SQL_KMV_DISTINCT,
    "weighted_sample_topk": SQL_WEIGHTED_SAMPLE,
    "countmin_heavy_hitters": SQL_COUNTMIN_HEAVY_HITTERS,
    "hard_negative_mining": SQL_HARD_NEGATIVE_MINING,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "kmeans_clusters": SQL_KMEANS_CLUSTERS,
    "kvstore_avro_file_join": SQL_KVSTORE_AVRO_FILE,
    "sample_cluster_balanced": SQL_SAMPLE_CLUSTER_BALANCED,
    "salted_topk_events": SQL_SALTED_TOPK_EVENTS,
    "gather_pricing_summary": SQL_GATHER_PRICING,
    "filter_pushdown_revenue": SQL_FILTER_PUSHDOWN,
    "kvstore_lookup_join": SQL_KVSTORE_LOOKUP,
    "semi_join_customers_with_orders": SQL_SEMI_JOIN,
    "anti_join_customers_without_orders": SQL_ANTI_JOIN,
    "join_revenue_by_nation": SQL_JOIN_REVENUE,
    "producer_price_band": SQL_PRODUCER_PRICE_BAND,
    "pivot_orders_by_customer": SQL_PIVOT_ORDERS,
    "versioned_latest_event_value": SQL_VERSIONED_LATEST,
    "versioned_slice_maxversions": SQL_VERSIONED_SLICE,
    "cell_rewrite_int_to_long": SQL_CELL_REWRITE,
    "map_family_regex_filter": SQL_MAP_FAMILY_REGEX,
    "bulk_import_props": SQL_BULK_IMPORT,
    "window_top3_orders_per_customer": SQL_WINDOW_TOP3,
    "set_ops_nations": SQL_SET_OPS,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "mapreduce_event_stats": SQL_MAPREDUCE_EVENTS,
    "topk_shipping_priority": SQL_TOPK_SHIPPING,
    "union_all_parties": SQL_UNION_ALL,
    "cube_order_stats": SQL_CUBE_ORDERS,
    "distinct_segments": SQL_DISTINCT_SEGMENTS,
    "entity_key_hash": SQL_ENTITY_KEY_HASH,
    "text_byte_stats": SQL_TEXT_BYTE_STATS,
    "window_running_revenue": SQL_WINDOW_RUNNING,
    "asof_join_purchase_click": SQL_ASOF_JOIN,
    "range_join_price_bands": SQL_RANGE_JOIN,
    "dedup_exact": SQL_DEDUP_EXACT,
    "text_token_count": SQL_TEXT_TOKEN_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "knn_cosine_topk": SQL_KNN_COSINE,
    "embedding_label_cosine_stats": SQL_EMBEDDING_LABEL_STATS,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "streaming_windowed_counts": SQL_STREAMING_WINDOWED,
    "sessionize_events": SQL_SESSIONIZE,
    "quantiles_order_price": SQL_QUANTILES,
    "sql_surface_big_spenders": SQL_BIG_SPENDERS,
    "grouping_sets_orders": SQL_GROUPING_SETS,
    "wordcount_top50": SQL_WORDCOUNT,
    "tfidf_top_terms": SQL_TFIDF,
    "pivot_wide_event_values": SQL_PIVOT_WIDE,
    "array_agg_priorities": SQL_ARRAY_AGG,
    "text_langid": SQL_TEXT_LANGID,
    "text_repetition": SQL_TEXT_REPETITION,
    "decontaminate_overlap": oracles.decontaminate_sql(
        n=3, modulus=23, threshold=0.5),
    "text_pii": SQL_TEXT_PII,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "sample_stratum_topk": SQL_SAMPLE_STRATUM_TOPK,
    "mixture_token_budget": SQL_MIXTURE_TOKEN_BUDGET,
    "streaming_dedup_docs": SQL_STREAMING_DEDUP,
    "pack_documents": SQL_PACK_DOCUMENTS,
    "pipeline_curate": SQL_PIPELINE_CURATE,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "dedup_incremental_pairs": (
        "SELECT * FROM (\n" + oracles.minhash_pairs_sql(threshold=0.5)
        + "\n) WHERE id_a % 2 = 1 OR id_b % 2 = 1"),
    "events_anomaly_zscore": SQL_EVENTS_ANOMALY,
    "embedding_near_dups": _embedding_lsh_oracle_sql(),
    "dedup_minhash_pairs": oracles.minhash_pairs_sql(threshold=0.5),
    "dedup_source_matrix": oracles.near_dup_source_matrix_sql(threshold=0.5),
    "events_json_props": SQL_EVENTS_JSON_PROPS,
    "timeseries_gapfill": SQL_TIMESERIES_GAPFILL,
    "snapshot_diff_orders": SQL_SNAPSHOT_DIFF_ORDERS,
    "data_quality_audit": SQL_DATA_QUALITY_AUDIT,
    "dedup_simhash_pairs": oracles.simhash_pairs_sql(max_hamming=10, bands=4),
    "dedup_corpus_survivors": oracles.corpus_survivors_sql(threshold=0.5),
    "text_fingerprint": oracles.fingerprint_sql(),
    "knn_lsh_topk": oracles.knn_lsh_sql(n_planes=4, k=5),
    "knn_ivf_topk": oracles.knn_ivf_sql(n_centroids=8, nprobe=2, k=5),
    "knn_pq_topk": oracles.knn_pq_sql(n_subspaces=8, n_codes=16, k=5,
                                      refine=4),
    "streaming_interval_join": SQL_STREAMING_INTERVAL_JOIN,
    "bm25_search_topk": oracles.bm25_sql(_BM25_QUERIES, k=10),
    "lm_bigram_quality": oracles.bigram_lm_sql(alpha=0.1),
    "decontaminate_spans": oracles.decontaminate_spans_sql(n=3, modulus=23),
    "dedup_repeated_ngrams": oracles.repeated_ngram_coverage_sql(
        n=3, min_docs=2),
    "pagerank_nation_trade": oracles.pagerank_sql(
        """SELECT sn.n_name AS src, cn.n_name AS dst,
                  count(*)::DOUBLE AS w
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation sn ON sn.n_nationkey = s.s_nationkey
           JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           GROUP BY 1, 2""",
        damping=0.85, iters=5, node_alias="nation",
        rank_alias="pagerank"),
    # rows-only (genuinely non-SQL-expressible): multimodal_features
    # (the sha256-float fake-decode runs in a Pandas UDF)
}
