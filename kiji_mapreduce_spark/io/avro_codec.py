"""Pure-Python Avro Object Container File codec.

Why this exists: the reference ships Avro container files as first-class
job inputs/outputs and KV-store backings (``MapReduceJobInputs.java:
112-143``, ``MapReduceJobOutputs.java``, ``kvstore/lib/
AvroRecordKeyValueStore.java:84``), but Spark's Avro DataSource lives in
an external jar (spark-avro) that is not bundled with pyspark. Rather
than gate the formats on a jar the environment may not ship, this module
implements the container format from the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/): the ``Obj\\x01``
header with JSON schema + codec metadata, sync-marker-delimited blocks,
and zigzag-varint binary encoding, with ``null`` and ``deflate`` codecs.

The IO layer (``io/inputs.py`` / ``io/outputs.py``) prefers the
spark-avro jar when it is on the classpath — the jar additionally splits
*within* large files by scanning for sync markers — and falls back to
this codec otherwise, parallelizing decode across files via
``binaryFile`` + ``mapInPandas``. At 100 TB you would run with the jar;
this codec guarantees the formats always work and is plenty for
KV-store-sized and staging-sized Avro data.

Type mapping (both directions):

==============  ==========================
Avro            Spark
==============  ==========================
boolean         boolean
int             int
long            long
float           float
double          double
bytes / fixed   binary
string / enum   string
record          struct
array           array
map             map (string keys)
union[null, T]  nullable T
int  {date}     date
long {timestamp-micros/millis}        timestamp (instant)
long {local-timestamp-micros/millis}  timestamp_ntz (wall clock)
==============  ==========================

General (non-null) unions, decimals, and durations are rejected with a
clear error instead of a silent mangle.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


def normalize_schema(schema):
    """Accept a JSON string or parsed value; return the parsed form with
    ``{"type": "int"}``-style wrappers collapsed to plain strings."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        schema = json.loads(schema)
    if isinstance(schema, dict) and set(schema) == {"type"} and \
            isinstance(schema["type"], str):
        return schema["type"]
    return schema


def _logical(schema):
    return schema.get("logicalType") if isinstance(schema, dict) else None


# ---------------------------------------------------------------------------
# binary decoder / encoder (spec "Binary Encoding")


class Decoder:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated Avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        buf = self.buf
        pos = self.pos
        end = len(buf)
        while True:
            if pos >= end:
                raise EOFError("truncated Avro data (varint)")
            byte = buf[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                # spec caps a long at 10 varint bytes; an unbounded run of
                # continuation bytes is corruption, not a bigger number
                raise ValueError("overlong Avro varint (corrupt data)")
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_value(self, schema):
        if isinstance(schema, str):
            if schema == "null":
                return None
            if schema == "boolean":
                return self.read(1) == b"\x01"
            if schema in ("int", "long"):
                return self.read_long()
            if schema == "float":
                return struct.unpack("<f", self.read(4))[0]
            if schema == "double":
                return struct.unpack("<d", self.read(8))[0]
            if schema == "bytes":
                return self.read_bytes()
            if schema == "string":
                return self.read_bytes().decode("utf-8")
            raise ValueError(f"unknown Avro type {schema!r}")
        if isinstance(schema, list):  # union: long index + value
            idx = self.read_long()
            if idx < 0:
                # a negative Python index silently WRAPS to the last
                # branch — corrupt data must raise the documented
                # error, not decode as the wrong type (r13 review
                # finding); out-of-range positives already raise via
                # the IndexError wrap
                raise IndexError(f"union index {idx} out of range")
            branch = schema[idx]
            return self.read_value(normalize_schema(branch))
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: self.read_value(normalize_schema(f["type"]))
                for f in schema["fields"]
            }
        if t == "array":
            items = normalize_schema(schema["items"])
            out = []
            while True:
                n = self.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    self.read_long()
                for _ in range(n):
                    out.append(self.read_value(items))
        if t == "map":
            values = normalize_schema(schema["values"])
            out = {}
            while True:
                n = self.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.read_long()
                for _ in range(n):
                    k = self.read_bytes().decode("utf-8")
                    out[k] = self.read_value(values)
        if t == "enum":
            sym = self.read_long()
            if sym < 0:  # same negative-wrap hazard as union indexes
                raise IndexError(f"enum index {sym} out of range")
            return schema["symbols"][sym]
        if t == "fixed":
            return self.read(schema["size"])
        if t in _PRIMITIVES:  # {"type": "int", "logicalType": ...}
            lt = _logical(schema)
            if lt in ("decimal", "duration"):
                raise ValueError(
                    f"Avro {lt!r} logical type is not supported — "
                    "rejecting instead of returning raw unscaled bytes")
            v = self.read_value(t)
            if lt == "date":
                return _EPOCH_DATE + _dt.timedelta(days=v)
            if lt in ("timestamp-micros", "local-timestamp-micros"):
                return _EPOCH_TS + _dt.timedelta(microseconds=v)
            if lt in ("timestamp-millis", "local-timestamp-millis"):
                return _EPOCH_TS + _dt.timedelta(milliseconds=v)
            return v
        raise ValueError(f"unsupported Avro schema {schema!r}")


class Encoder:
    def __init__(self):
        self.out = io.BytesIO()

    def write_long(self, v: int) -> None:
        # zigzag; branch form stays correct for Python's unbounded ints
        n = (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)
        buf = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                buf.append(b | 0x80)
            else:
                buf.append(b)
                break
        self.out.write(bytes(buf))

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.out.write(b)

    def write_value(self, schema, v) -> None:
        if isinstance(schema, str):
            if schema == "null":
                if v is not None:
                    raise ValueError("non-null value for null schema")
                return
            if schema == "boolean":
                self.out.write(b"\x01" if v else b"\x00")
                return
            if schema in ("int", "long"):
                self.write_long(int(v))
                return
            if schema == "float":
                self.out.write(struct.pack("<f", float(v)))
                return
            if schema == "double":
                self.out.write(struct.pack("<d", float(v)))
                return
            if schema == "bytes":
                self.write_bytes(bytes(v))
                return
            if schema == "string":
                self.write_bytes(str(v).encode("utf-8"))
                return
            raise ValueError(f"unknown Avro type {schema!r}")
        if isinstance(schema, list):  # union — [null, T] only (writer side)
            non_null = [(i, b) for i, b in enumerate(schema)
                        if normalize_schema(b) != "null"]
            if len(non_null) > 1:
                # enforce the documented writer contract instead of
                # silently encoding every value as the FIRST non-null
                # branch — which mangles types (int written via the
                # string branch) or crashes mid-file (r13 review
                # finding); the reader side already rejects loudly
                raise ValueError(
                    "writer supports [null, T] unions only, got "
                    f"{len(non_null)} non-null branches")
            if v is None:
                idx = next(
                    i for i, b in enumerate(schema)
                    if normalize_schema(b) == "null")
                self.write_long(idx)
                return
            if not non_null:
                raise ValueError(
                    f"union {schema!r} has no branch for value {v!r}")
            idx, branch = non_null[0]
            self.write_long(idx)
            self.write_value(normalize_schema(branch), v)
            return
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                self.write_value(normalize_schema(f["type"]),
                                 None if v is None else v.get(f["name"]))
            return
        if t == "array":
            items = normalize_schema(schema["items"])
            if v:
                self.write_long(len(v))
                for item in v:
                    self.write_value(items, item)
            self.write_long(0)
            return
        if t == "map":
            values = normalize_schema(schema["values"])
            if v:
                self.write_long(len(v))
                for k, item in v.items():
                    self.write_bytes(str(k).encode("utf-8"))
                    self.write_value(values, item)
            self.write_long(0)
            return
        if t == "enum":
            self.write_long(schema["symbols"].index(v))
            return
        if t == "fixed":
            b = bytes(v)
            if len(b) != schema["size"]:
                raise ValueError("fixed size mismatch")
            self.out.write(b)
            return
        if t in _PRIMITIVES:
            lt = _logical(schema)
            if lt in ("decimal", "duration"):
                raise ValueError(
                    f"Avro {lt!r} logical type is not supported")
            if lt == "date":
                v = (v - _EPOCH_DATE).days
            elif lt in ("timestamp-micros", "local-timestamp-micros",
                        "timestamp-millis", "local-timestamp-millis"):
                # exact integer arithmetic: float total_seconds() loses
                # microseconds once |micros| > 2^53 (e.g. year-9999
                # sentinels)
                td = v - _EPOCH_TS
                micros = (td.days * 86_400 + td.seconds) * 1_000_000 \
                    + td.microseconds
                v = micros if lt.endswith("micros") else micros // 1_000
            self.write_value(t, v)
            return
        raise ValueError(f"unsupported Avro schema {schema!r}")


# ---------------------------------------------------------------------------
# container file (spec "Object Container Files")


#: error classes corrupt container bytes can surface that are NOT
#: already ValueError subclasses (UnicodeDecodeError and
#: json.JSONDecodeError are): a flipped bit in a deflate block raises
#: zlib.error, a header whose meta map lacks avro.schema raises
#: KeyError, and a corrupted union/enum index raises IndexError from
#: the branch lookup. Hostile bytes must decode or raise the
#: documented (ValueError, EOFError) surface — a raw zlib.error
#: aborts the Spark task that owns the file with an opaque error
#: (r11 fuzz findings; the media codecs' wrapper discipline applied
#: to Avro).
_CORRUPT_WRAP = (KeyError, IndexError, zlib.error)


def read_container(buf: bytes):
    """Decode a whole container file -> (schema, list-of-values).

    Top-level records decode to dicts; other top-level types decode to
    their Python mapping. Corrupt bytes raise ValueError/EOFError only.
    """
    try:
        return _read_container_unchecked(buf)
    except _CORRUPT_WRAP as e:
        raise ValueError(
            f"corrupt Avro container: {type(e).__name__}: {e}") from e


def _read_container_unchecked(buf: bytes):
    dec = Decoder(buf)
    if dec.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = dec.read_value(meta_schema)
    schema = normalize_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = dec.read(16)
    values = []
    while dec.pos < len(buf):
        n_records = dec.read_long()
        block = dec.read(dec.read_long())
        if dec.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        bdec = Decoder(block)
        for _ in range(n_records):
            values.append(bdec.read_value(schema))
    return schema, values


def read_container_schema(buf: bytes):
    """Parse just the header of a container file -> schema. Needs only
    the first few KB (schema JSON + codec), so callers can pass a bounded
    prefix of a huge file. Corrupt bytes raise ValueError/EOFError only."""
    try:
        dec = Decoder(buf)
        if dec.read(4) != MAGIC:
            raise ValueError(
                "not an Avro object container file (bad magic)")
        meta = dec.read_value({"type": "map", "values": "bytes"})
        return normalize_schema(meta["avro.schema"].decode("utf-8"))
    except _CORRUPT_WRAP as e:
        raise ValueError(
            f"corrupt Avro container: {type(e).__name__}: {e}") from e


def read_file_header(f):
    """Parse a container header from an open binary file ->
    (schema, codec, sync, header_len). Reads only as much of the file as
    the header occupies (schema JSON + codec metadata + sync marker),
    growing the buffer on demand, so it is cheap even on huge files."""
    f.seek(0)
    buf = f.read(1 << 16)
    while True:
        try:
            dec = Decoder(buf)
            if dec.read(4) != MAGIC:
                raise ValueError(
                    "not an Avro object container file (bad magic)")
            meta = dec.read_value({"type": "map", "values": "bytes"})
            schema = normalize_schema(meta["avro.schema"].decode("utf-8"))
            codec = meta.get("avro.codec", b"null").decode("utf-8")
            sync = dec.read(16)
            return schema, codec, sync, dec.pos
        except EOFError:
            more = f.read(len(buf))
            if not more:
                raise
            buf += more
        except _CORRUPT_WRAP as e:
            raise ValueError(
                f"corrupt Avro container: {type(e).__name__}: {e}"
            ) from e


def read_container_split(path, start, end, header=None):
    """Decode the blocks of ``path`` owned by the byte range
    ``[start, end)`` -> (writer_schema, values).

    Split ownership follows the Hadoop/Avro convention
    (``MapReduceJobInputs.java:112-143`` semantics, Avro
    ``DataFileReader.sync``/``pastSync``): a split owns a block iff the
    16-byte sync marker *preceding* the block starts inside
    ``[start, end)``. The header's trailing sync counts, so the first
    data block belongs to the split containing ``header_len - 16``.
    Splits that tile ``[0, file_size)`` therefore decode every record
    exactly once, and the last owned block may read past ``end`` —
    exactly how the splittable jar path behaves. Like the Java reader,
    a sync-pattern collision inside block data (probability 2^-128 per
    position) would mis-align the scan; this is accepted by the format.
    Corrupt bytes raise ValueError/EOFError only.
    """
    try:
        return _read_container_split_unchecked(path, start, end, header)
    except _CORRUPT_WRAP as e:
        raise ValueError(
            f"corrupt Avro container: {type(e).__name__}: {e}") from e


def _read_container_split_unchecked(path, start, end, header=None):
    with open(path, "rb") as f:
        if header is None:
            header = read_file_header(f)
        schema, codec, sync, header_len = header
        if codec == "deflate":
            inflate = lambda b: zlib.decompress(b, -15)  # noqa: E731
        elif codec == "null":
            inflate = lambda b: b  # noqa: E731
        else:
            raise ValueError(f"unsupported Avro codec {codec!r}")
        size = os.fstat(f.fileno()).st_size
        lo = max(start, header_len - 16)
        if lo >= end or lo + 16 > size:
            return schema, []
        # scan [lo, end+15) for the first owned marker (it must START
        # before `end` but may extend past it) in 1 MB chunks with a
        # 15-byte carry — materializing the whole range would hold up to
        # split_bytes in memory and read those bytes twice (r5 review
        # finding); the first marker is normally within one block of lo
        m_abs = None
        f.seek(lo)
        pos = lo
        carry = b""
        while pos < end + 15:
            chunk = f.read(min(1 << 20, end + 15 - pos))
            if not chunk:
                break
            buf = carry + chunk
            m = buf.find(sync)
            if m >= 0:
                m_abs = pos - len(carry) + m
                break
            carry = buf[-15:]
            pos += len(chunk)
        if m_abs is None or m_abs >= end:
            return schema, []
        values = []
        pos = m_abs + 16  # first owned block's count varint
        while pos - 16 < end and pos < size:
            f.seek(pos)
            head = Decoder(f.read(20))  # two varints, <=10 bytes each
            n_records = head.read_long()
            block_len = head.read_long()
            data_off = pos + head.pos
            f.seek(data_off)
            block = f.read(block_len)
            if len(block) != block_len:
                raise EOFError(f"truncated Avro block in {path}")
            if f.read(16) != sync:
                raise ValueError(
                    f"sync marker mismatch in {path} (corrupt block)")
            bdec = Decoder(inflate(block))
            for _ in range(n_records):
                values.append(bdec.read_value(schema))
            pos = data_off + block_len + 16
        return schema, values


def write_container(schema, values, codec: str = "deflate",
                    block_records: int = 4096) -> bytes:
    """Encode values into container-file bytes. ``schema`` may be a JSON
    string or parsed; values must match it (records as dicts)."""
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    schema = normalize_schema(schema_json)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    henc = Encoder()
    henc.write_value(
        {"type": "map", "values": "bytes"},
        {"avro.schema": schema_json.encode("utf-8"),
         "avro.codec": codec.encode("utf-8")})
    out.write(henc.out.getvalue())
    out.write(sync)

    def flush(batch):
        enc = Encoder()
        for v in batch:
            enc.write_value(schema, v)
        data = enc.out.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        benc = Encoder()
        benc.write_long(len(batch))
        benc.write_bytes(data)
        out.write(benc.out.getvalue())
        out.write(sync)

    batch = []
    for v in values:
        batch.append(v)
        if len(batch) >= block_records:
            flush(batch)
            batch = []
    if batch:
        flush(batch)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Avro <-> Spark schema bridging


# writer type -> reader types it may resolve to (spec promotion rules)
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _strip_null(schema):
    """union[null, T] -> T (for compatibility comparison)."""
    if isinstance(schema, list):
        non_null = [normalize_schema(b) for b in schema
                    if normalize_schema(b) != "null"]
        if len(non_null) == 1:
            return non_null[0]
    return schema


def _check_resolvable(writer_t, reader_t, name: str) -> None:
    """Reject reader fields whose type can't hold the writer's values —
    name-only matching would hand Arrow wrongly-typed Python objects and
    crash (or silently coerce) executor-side."""
    w, r = _strip_null(writer_t), _strip_null(reader_t)
    if w == r:
        return
    if isinstance(w, str) and isinstance(r, str) and \
            r in _PROMOTIONS.get(w, set()):
        return
    raise ValueError(
        f"reader field {name!r}: type {reader_t!r} cannot resolve "
        f"writer type {writer_t!r} (only identical types and spec "
        "promotions are supported)")


def default_to_python(schema, default):
    """Convert a field default from its JSON form (spec "default values")
    to the representation ``read_value`` produces for the same schema, so
    a row filled from a default has the same Python/Arrow type as a row
    decoded from data: bytes/fixed defaults are ISO-8859-1 strings in
    JSON, logical-typed defaults are raw ints."""
    schema = normalize_schema(schema)
    if isinstance(schema, list):
        # spec: a union field's default is interpreted per the FIRST branch
        return default_to_python(normalize_schema(schema[0]), default)
    if default is None:
        return None
    if isinstance(schema, str):
        return default.encode("iso-8859-1") if schema == "bytes" else default
    lt = _logical(schema)
    if lt in ("decimal", "duration"):
        raise ValueError(f"Avro {lt!r} logical type is not supported")
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=default)
    if lt in ("timestamp-micros", "local-timestamp-micros"):
        return _EPOCH_TS + _dt.timedelta(microseconds=default)
    if lt in ("timestamp-millis", "local-timestamp-millis"):
        return _EPOCH_TS + _dt.timedelta(milliseconds=default)
    t = schema["type"]
    if t in ("bytes", "fixed"):
        return default.encode("iso-8859-1")
    if t == "record":
        return {
            f["name"]: default_to_python(
                f["type"], default.get(f["name"], f.get("default")))
            for f in schema["fields"]}
    if t == "array":
        return [default_to_python(schema["items"], d) for d in default]
    if t == "map":
        return {k: default_to_python(schema["values"], d)
                for k, d in default.items()}
    if t in _PRIMITIVES:  # {"type": "int"}-style wrapper, no logical type
        return default_to_python(t, default)
    return default  # enum: symbol string is already the decoded form


def resolve_records(values, writer_schema, reader_schema):
    """Top-level record schema resolution (spec "Schema Resolution"):
    project writer records onto the reader schema — fields matched by
    name, missing reader fields filled from their ``default``, writer
    fields absent from the reader dropped. Raises if a reader field has
    no writer counterpart and no default."""
    writer_schema = normalize_schema(writer_schema)
    reader_schema = normalize_schema(reader_schema)
    if not (isinstance(writer_schema, dict)
            and writer_schema.get("type") == "record"
            and isinstance(reader_schema, dict)
            and reader_schema.get("type") == "record"):
        raise ValueError("schema resolution supports record top-levels")
    writer_types = {f["name"]: normalize_schema(f["type"])
                    for f in writer_schema["fields"]}
    plan = []  # (name, from_writer, default)
    for f in reader_schema["fields"]:
        name = f["name"]
        if name in writer_types:
            _check_resolvable(writer_types[name],
                              normalize_schema(f["type"]), name)
            plan.append((name, True, None))
        elif "default" in f:
            # convert the JSON-form default to decoded-Python form NOW so
            # default-filled rows carry the same types as decoded rows
            # (a date default left as int would crash Arrow executor-side)
            plan.append((name, False,
                         default_to_python(f["type"], f["default"])))
        else:
            raise ValueError(
                f"reader field {name!r} missing from writer schema and "
                "has no default")
    return [
        {name: (v.get(name) if from_writer else default)
         for name, from_writer, default in plan}
        for v in values
    ]


def avro_to_spark_type(schema):
    """Avro schema -> (pyspark DataType, nullable)."""
    from pyspark.sql import types as T

    schema = normalize_schema(schema)
    if isinstance(schema, list):
        branches = [normalize_schema(b) for b in schema]
        non_null = [b for b in branches if b != "null"]
        if len(non_null) != 1 or len(non_null) == len(branches):
            raise ValueError(
                f"only union[null, T] is supported, got {schema!r}")
        dt, _ = avro_to_spark_type(non_null[0])
        return dt, True
    if isinstance(schema, str):
        simple = {
            "boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if schema in simple:
            return simple[schema], False
        raise ValueError(f"unsupported Avro type {schema!r}")
    t = schema["type"]
    lt = _logical(schema)
    if lt in ("decimal", "duration"):
        raise ValueError(
            f"Avro {lt!r} logical type is not supported — rejecting "
            "instead of surfacing raw unscaled bytes")
    if lt == "date":
        return T.DateType(), False
    if lt in ("timestamp-micros", "timestamp-millis"):
        # instant semantics, like spark-avro (exact under the engine's
        # pinned UTC session)
        return T.TimestampType(), False
    if lt in ("local-timestamp-micros", "local-timestamp-millis"):
        return T.TimestampNTZType(), False
    if t == "record":
        fields = []
        for f in schema["fields"]:
            dt, nullable = avro_to_spark_type(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if t == "array":
        dt, nullable = avro_to_spark_type(schema["items"])
        return T.ArrayType(dt, nullable), False
    if t == "map":
        dt, nullable = avro_to_spark_type(schema["values"])
        return T.MapType(T.StringType(), dt, nullable), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    if t in _PRIMITIVES:
        return avro_to_spark_type(t)
    raise ValueError(f"unsupported Avro schema {schema!r}")


def spark_type_to_avro(dt, nullable: bool, name_hint: str = "rec"):
    """pyspark DataType -> Avro schema (nullable -> union[null, T])."""
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        out = "boolean"
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        out = "int"
    elif isinstance(dt, T.LongType):
        out = "long"
    elif isinstance(dt, T.FloatType):
        out = "float"
    elif isinstance(dt, T.DoubleType):
        out = "double"
    elif isinstance(dt, T.StringType):
        out = "string"
    elif isinstance(dt, T.BinaryType):
        out = "bytes"
    elif isinstance(dt, T.DateType):
        out = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, T.TimestampType):
        out = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.TimestampNTZType):
        # wall-clock semantics survive round-trips and jar interop
        out = {"type": "long", "logicalType": "local-timestamp-micros"}
    elif isinstance(dt, T.ArrayType):
        out = {"type": "array",
               "items": spark_type_to_avro(
                   dt.elementType, dt.containsNull, name_hint + "_item")}
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        out = {"type": "map",
               "values": spark_type_to_avro(
                   dt.valueType, dt.valueContainsNull, name_hint + "_val")}
    elif isinstance(dt, T.StructType):
        out = {
            "type": "record", "name": name_hint,
            "fields": [
                {"name": f.name,
                 "type": spark_type_to_avro(
                     f.dataType, f.nullable, name_hint + "_" + f.name)}
                for f in dt.fields],
        }
    else:
        raise ValueError(f"cannot map Spark type {dt} to Avro")
    return ["null", out] if nullable else out


def spark_schema_to_avro(schema, name: str = "topLevelRecord"):
    """StructType -> top-level Avro record schema (mirrors the column
    naming the spark-avro jar uses)."""
    rec = spark_type_to_avro(schema, False, name)
    rec["name"] = name
    return rec
