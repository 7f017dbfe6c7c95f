"""Shared suite helpers: session hardening and table readers for the
driver test parquet (nanos timestamps normalized, UTC session tz)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


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
            # write-then-rename: a crash mid-write otherwise leaves a
            # truncated zip that the NEXT call's exists() check happily
            # ships to every executor (r13 review finding)
            tmp = zip_path + f".tmp{os.getpid()}"
            with zipfile.ZipFile(tmp, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for fname in files:
                        if not fname.endswith(".py"):
                            continue
                        full = os.path.join(root, fname)
                        rel = os.path.join(
                            "kiji_mapreduce_spark",
                            os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
            os.replace(tmp, zip_path)
        sc.addPyFile(zip_path)
        _SHIPPED_SESSIONS.add(app_id)
    except Exception:
        pass  # workers already have the package (e.g. installed/PYTHONPATH)


#: (applicationId, path) -> inferred StructType. Schema METADATA only —
#: never data, plans, or results: every action still scans the parquet
#: files. Rationale (optimization guide §1/§6): each bare
#: ``spark.read.parquet`` call pays a driver-side footer-inference job
#: (~130 ms measured at sf0.1), and the suite re-resolves the same
#: static driver tables hundreds of times per bench sweep; a catalog
#: would cache exactly this. Keyed on applicationId so a new session
#: (or a driver-owned session) re-infers once.
_SCHEMA_CACHE: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_conf(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


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
