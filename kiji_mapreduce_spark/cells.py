"""Versioned-cell semantics — the genuinely custom part (SURVEY.md §4).

A cell is ``array<struct<ts: long, value: T>>`` kept sorted ts-descending
(newest first). These helpers implement, as pure Catalyst expressions:

- ``latest`` / ``latest_value``: most-recent version
  (reference ``KijiRowData.getMostRecentValue``)
- ``put_cell``: timestamped insert with latest-wins-at-equal-ts semantics
  (reference resolves ``HConstants.LATEST_TIMESTAMP`` at write time,
  ``KijiHFileOutputFormat.java:190-194``)
- ``retain_versions`` / ``expire_ttl``: maxVersions & TTL retention applied
  at compaction (the reference delegates these to HBase compactions)
- ``apply_tombstones``: delete-cell / delete-column / up-to-timestamp
  semantics (``DirectKijiTableWriterContext.java:104-151``)

All operate element-wise on array columns — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def sort_cells(cells: Column) -> Column:
    """Normalize a cell array to ts-descending (newest first).

    Sorts on ``ts`` ALONE via a comparator: the default struct ordering
    would also compare values, which fails analysis outright for
    unorderable value types (map-typed cells, which the layout schema
    explicitly allows — r5 review finding) and is unnecessary because
    every write path keeps ts unique within a cell array."""
    return F.array_sort(
        cells,
        lambda a, b: (F.when(a["ts"] < b["ts"], 1)
                      .when(a["ts"] > b["ts"], -1).otherwise(0)))


def latest(cells: Column) -> Column:
    """Most recent version struct (ts, value), or null for empty cells.
    try_element_at: empty cells yield null instead of erroring (ANSI)."""
    return F.try_element_at(cells, F.lit(1))


def latest_value(cells: Column) -> Column:
    """Most recent value (``getMostRecentValue``)."""
    return latest(cells)["value"]


def value_at(cells: Column, ts) -> Column:
    """Value as of timestamp ``ts`` (newest version with cell.ts <= ts)."""
    ts = F.lit(ts) if not isinstance(ts, Column) else ts
    return F.try_element_at(
        F.filter(cells, lambda c: c["ts"] <= ts), F.lit(1))["value"]


def put_cell(cells: Column, ts, value) -> Column:
    """Insert one version; same-ts put overwrites (latest write wins).

    Null-safe: putting into a never-written (null) cell creates it.
    """
    ts = F.lit(ts) if not isinstance(ts, Column) else ts
    value = F.lit(value) if not isinstance(value, Column) else value
    base = F.coalesce(cells, F.array())
    without_dup = F.filter(base, lambda c: c["ts"] != ts)
    new = F.struct(ts.alias("ts"), value.alias("value"))
    return sort_cells(F.array_append(without_dup, new))


def retain_versions(cells: Column, max_versions: int) -> Column:
    """Keep the newest ``max_versions`` versions (maxVersions retention)."""
    return F.slice(cells, 1, max_versions)


def expire_ttl(cells: Column, ttl_seconds: int, now_ms) -> Column:
    """Drop versions older than ``ttl_seconds`` relative to ``now_ms``."""
    now_ms = F.lit(now_ms) if not isinstance(now_ms, Column) else now_ms
    cutoff = now_ms - F.lit(ttl_seconds * 1000)
    return F.filter(cells, lambda c: c["ts"] >= cutoff)


def delete_cell(cells: Column, ts) -> Column:
    """Tombstone one exact version (DeleteCell)."""
    ts = F.lit(ts) if not isinstance(ts, Column) else ts
    return F.filter(cells, lambda c: c["ts"] != ts)


def delete_upto(cells: Column, ts) -> Column:
    """Tombstone all versions with cell.ts <= ts ('up to timestamp')."""
    ts = F.lit(ts) if not isinstance(ts, Column) else ts
    return F.filter(cells, lambda c: c["ts"] > ts)


def rewrite_values(cells: Column, fn) -> Column:
    """Cell rewrite preserving timestamps — the KijiCellRewriter primitive
    (``.../pivot/KijiCellRewriter.java:250-269``): apply ``fn`` (e.g. a
    cast for int->long schema migration) to every version's value."""
    return F.transform(
        cells, lambda c: F.struct(c["ts"].alias("ts"), fn(c["value"]).alias("value"))
    )


def convert_record(value: Column, src, dst, defaults: dict | None = None) -> Column:
    """Avro-style record schema resolution as one Catalyst expression
    (``KijiCellRewriter.java:250-269``: the reference decodes with the
    writer schema and re-encodes with the reader schema):

    - fields present in both: matched BY NAME (not position), value cast
      to the target field type, recursing into nested records;
    - fields only in ``dst``: filled from ``defaults`` (or null) — the
      Avro reader-schema default;
    - fields only in ``src``: dropped.

    ``src``/``dst`` are StructTypes; a null source record stays null.
    """
    from pyspark.sql.types import StructType

    defaults = defaults or {}
    src_names = set(src.fieldNames())
    parts = []
    for f in dst.fields:
        if f.name in src_names:
            sub = value[f.name]
            sub_src = src[f.name].dataType
            if isinstance(f.dataType, StructType) and isinstance(sub_src, StructType):
                sub = convert_record(
                    sub, sub_src, f.dataType,
                    defaults.get(f.name) if isinstance(
                        defaults.get(f.name), dict) else None)
            else:
                sub = sub.cast(f.dataType)
            parts.append(sub.alias(f.name))
        else:
            parts.append(F.lit(defaults.get(f.name)).cast(f.dataType)
                         .alias(f.name))
    return F.when(value.isNull(), F.lit(None).cast(dst)) \
        .otherwise(F.struct(*parts))


def cells_from_events(ts: Column, value: Column) -> Column:
    """groupBy aggregation expression building a versioned cell from
    (ts, value) event rows: ``collect_list(struct(ts, value))`` sorted
    newest-first. Use inside ``.agg(...)``."""
    return sort_cells(F.collect_list(F.struct(ts.alias("ts"), value.alias("value"))))
