"""DataRequest: declarative projection + version/time slicing.

The reference drives every table read through a ``KijiDataRequest``
(columns + maxVersions + timestamp range + column filters — reference
``.../input/KijiTableMapReduceJobInput.java:53-56``). Here a DataRequest
compiles to a ``select`` (column pruning, which Catalyst pushes into the
Parquet scan) plus per-cell ``filter``/``slice`` expressions on the
versioned-cell arrays — all JVM-side built-ins, no Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


def ts_range_filter(cells: Column, min_ts: int | None,
                    max_ts: int | None) -> Column:
    """``[min_ts, max_ts)`` cell filter with the ±2^62 open-bound
    sentinels — THE timestamp-window arithmetic: ``ColumnRequest``
    slicing and ``kvstore.TableKeyValueStore`` both call this one
    builder, so a lookup and a data request can never answer the same
    bounds differently (r13 review finding: two hand copies)."""
    if min_ts is None and max_ts is None:
        return cells
    lo = min_ts if min_ts is not None else -(1 << 62)
    hi = max_ts if max_ts is not None else (1 << 62)
    return F.filter(
        cells, lambda c: (c["ts"] >= F.lit(lo)) & (c["ts"] < F.lit(hi)))


@dataclass
class ColumnRequest:
    """One requested column (``family:qualifier``) or whole family.

    ``qualifier_regex`` mirrors RegexQualifierColumnFilter (map families);
    ``strip_values`` mirrors StripValueColumnFilter (existence checks).
    """

    family: str
    qualifier: str | None = None
    max_versions: int = 1
    min_ts: int | None = None
    max_ts: int | None = None  # exclusive, like HBase time ranges
    qualifier_regex: str | None = None
    strip_values: bool = False
    #: reader-schema override: decode cell values as this type at read time
    #: (the ColumnReaderSpec / avro.reader.schema analogue — reference
    #: HBaseKijiTableInputFormat.java:226-232); e.g. "long" to read
    #: int-written cells through a widened reader schema
    reader_schema: str | None = None

    def _slice_cells(self, cells: Column) -> Column:
        expr = ts_range_filter(cells, self.min_ts, self.max_ts)
        # cells are stored newest-first, so version limiting is a prefix slice
        if self.max_versions > 0:
            expr = F.slice(expr, 1, self.max_versions)
        if self.strip_values:
            expr = F.transform(
                expr, lambda c: F.struct(c["ts"].alias("ts"), F.lit(None).alias("value"))
            )
        if self.reader_schema is not None:
            target = self.reader_schema
            expr = F.transform(
                expr,
                lambda c: F.struct(
                    c["ts"].alias("ts"), c["value"].cast(target).alias("value")),
            )
        return expr

    def exprs(self, family_type=None) -> list[Column]:
        """Projection expressions for this request entry.

        ``family_type`` is the family column's Spark DataType (StructType
        for group families, MapType for map families) when the caller
        has a schema — whole-family requests need it to apply version/
        time slicing per qualifier (KijiDataRequest semantics: maxVersions
        and the timestamp range apply to EVERY requested column, whole
        families included; without it, a bare-family request used to
        return every stored version unsliced — r5 review finding)."""
        from pyspark.sql import types as T

        if self.qualifier is not None:  # one column of a group family
            cells = F.col(f"{self.family}.{self.qualifier}")
            name = f"{self.family}_{self.qualifier}"
            return [self._slice_cells(cells).alias(name)]
        # whole family: map families get regex qualifier filtering
        fam = F.col(self.family)
        if self.qualifier_regex is not None:
            if isinstance(family_type, T.StructType):
                # a clear contract error beats the opaque
                # DATATYPE_MISMATCH AnalysisException map_filter throws
                # on a struct column (r13 review finding); the
                # reference's RegexQualifierColumnFilter is likewise
                # map-family-only (qualifiers of a group family are
                # schema, not data)
                raise ValueError(
                    f"qualifier_regex on {self.family!r}: regex "
                    "qualifier filters apply to MAP families; "
                    f"{self.family!r} is a group family — request its "
                    "columns by name")
            fam = F.map_filter(fam, lambda k, _: k.rlike(self.qualifier_regex))
            fam = F.transform_values(fam, lambda _, v: self._slice_cells(v))
            return [fam.alias(self.family)]
        if isinstance(family_type, T.MapType):
            fam = F.transform_values(fam, lambda _, v: self._slice_cells(v))
        elif isinstance(family_type, T.StructType):
            fam = F.struct(*[
                self._slice_cells(fam[f.name]).alias(f.name)
                for f in family_type.fields])
        return [fam.alias(self.family)]


@dataclass
class DataRequest:
    """A set of ColumnRequests; compiles to a pruned projection."""

    columns: list[ColumnRequest] = field(default_factory=list)

    @classmethod
    def build(cls, *cols: str | ColumnRequest, max_versions: int = 1,
              min_ts: int | None = None, max_ts: int | None = None) -> "DataRequest":
        """Build from ``"family:qualifier"`` / ``"family"`` strings."""
        out = []
        for c in cols:
            if isinstance(c, ColumnRequest):
                out.append(c)
            else:
                family, _, qual = c.partition(":")
                out.append(ColumnRequest(
                    family=family, qualifier=qual or None,
                    max_versions=max_versions, min_ts=min_ts, max_ts=max_ts,
                ))
        return cls(out)

    def apply(self, df: DataFrame, keep: list[str] = ("entity_id",)) -> DataFrame:
        """Project the table down to the requested columns.

        Catalyst prunes unrequested families out of the Parquet scan —
        the analogue of the reference pushing the data request into the
        HBase scan (``HBaseKijiTableInputFormat.java:226-248``).
        """
        exprs: list[Column] = [F.col(k) for k in keep if k in df.columns]
        fields = {f.name: f.dataType for f in df.schema.fields}
        for creq in self.columns:
            exprs.extend(creq.exprs(family_type=fields.get(creq.family)))
        return df.select(*exprs)
