"""Local correctness harness mimicking the driver's oracle comparison.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
equivalent SQL on DuckDB; compares row count, column names, and an
order-insensitive value comparison (exact for non-floats, tiny-epsilon
for floats so we see whether rounding discipline held).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "timestamp"):  # datetime
        return v.isoformat()
    return v


def _sort_key_cell(x):
    # type-aware alignment key: floats sort NUMERICALLY after rounding
    # to the comparison tolerance, so two engines whose values differ
    # only within tolerance still pair the same rows (sorting on
    # str(x) could order 5.0 / 5.000000001 differently per side and
    # misalign the whole comparison — r13 review finding); the type
    # tag keeps mixed-type columns comparable
    if x is None:
        return (0, "")
    if isinstance(x, bool):
        return (1, str(x))
    if isinstance(x, (int, float)):
        # str(x) tiebreak keeps the sort total for rows that tie at
        # 6 dp but differ beyond tolerance
        return (2, float(round(x, 6)), str(x))
    return (3, str(x), "")


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(
        out, key=lambda t: tuple(_sort_key_cell(x) for x in t))


def _values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


# Typed-schema drift check, at type-CLASS granularity. The r3 lesson:
# the driver's hash is insensitive to integer width (int32 rank vs int64
# rank hashed equal) but an uncast DuckDB sum() yields HUGEINT/int128,
# which turns into float64/decimal on the driver's conversion path and
# fails the hash even though the Python values compare equal. So flag
# int-vs-float/decimal/string class mismatches, not width differences.
_INT_CLASSES = {"int8", "int16", "int32", "int64", "uint8", "uint16",
                "uint32", "uint64"}
_FLOAT_CLASSES = {"float", "double", "halffloat"}

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "string": "string",
    "boolean": "bool", "date": "date", "binary": "binary",
}


def _arrow_class(at: str) -> str | None:
    if at in _INT_CLASSES:
        return "int"
    if at in _FLOAT_CLASSES:
        return "float"
    if at.startswith("decimal"):
        return "decimal"
    if at in ("string", "large_string"):
        return "string"
    if at == "bool":
        return "bool"
    if at.startswith("date"):
        return "date"
    if at in ("binary", "large_binary"):
        return "binary"
    return None  # timestamps/lists/structs: value check covers them


def _type_mismatches(sdf, arrow_schema):
    spark_types = dict(sdf.dtypes)
    bad = []
    for field in arrow_schema:
        sc = _SPARK_CLASS.get(spark_types.get(field.name, ""))
        ac = _arrow_class(str(field.type))
        if sc is not None and ac is not None and sc != ac:
            bad.append(
                f"{field.name}: spark={spark_types[field.name]} "
                f"oracle={field.type}")
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entry_mod
    from kiji_mapreduce_spark.session import make_session

    spark = make_session(master="local[8]", shuffle_partitions=16,
                         extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        # staged seat candidates (registry.STAGED) drive BY NAME only:
        # the default full drive stays the driver-parity queries() set
        from kiji_mapreduce_spark import suite

        for name in only & set(suite.STAGED):
            qs[name] = suite.STAGED[name]
            oracles[name] = suite.STAGED_ORACLES[name]
    unknown = only - set(qs)
    if unknown:
        # a misspelled name previously matched nothing and the harness
        # printed the all-consistent success line — a false green from
        # the verification gate (r13 review finding)
        print(f"ERROR: unknown query name(s): {', '.join(sorted(unknown))}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({el:.1f}s) [rows-only]")
            if len(srows) == 0:
                print(f"  WARN {name}: 0 rows (weak signal)")
            continue
        try:
            res = con.execute(oracles[name])
            otbl = res.arrow()
            ocols = otbl.schema.names
            orows = [tuple(r.values()) for r in otbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        tbad = _type_mismatches(sdf, otbl.schema)
        if tbad:
            print(f"FAIL  {name}: typed-schema drift (driver hash would "
                  f"diverge): {tbad}")
            failures.append(name)
            continue
        sc, sr = _norm_rows(scols, srows)
        oc, orr = _norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            failures.append(name)
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: row count spark={len(sr)} oracle={len(orr)}")
            failures.append(name)
            continue
        bad = 0
        for a, b in zip(sr, orr):
            if not all(_values_equal(x, y) for x, y in zip(a, b)):
                if bad < 3:
                    print(f"  diff: spark={a} oracle={b}")
                bad += 1
        if bad:
            print(f"FAIL  {name}: {bad}/{len(sr)} mismatched rows")
            failures.append(name)
        else:
            exact = sr == orr
            tag = "OK   " if exact else "OK~  "  # ~ = tolerance-only match
            print(f"{tag} {name}: {len(sr)} rows ({el:.1f}s)"
                  + ("" if exact else "  [float tolerance — tighten rounding!]"))
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all checked queries consistent")


if __name__ == "__main__":
    main()
