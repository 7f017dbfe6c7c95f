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


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


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
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
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
