#!/usr/bin/env python3
"""Regenerate VERIFIED.json — the per-query verification-age ledger.

Scans every CORRECTNESS_r*.json artifact the round driver has written
and records, for each registry query, the LAST round in which the
driver's DuckDB-oracle comparison was fully green (rows + schema +
value-hash, no error). tests/test_suite_smoke.py::
test_verification_ledger_freshness then fails when a stale or
never-verified query sits outside the first-50 verification window —
making "no registry query older than 2 rounds" mechanical instead of
registry-comment discipline (r5 verdict ask #1).

Run from the repo root after each round's artifacts land:

    python tools/update_verified.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(rec: dict) -> bool:
    return (rec.get("err") is None
            and rec.get("rows_match") is True
            and rec.get("schema_match") is True
            and rec.get("hash_match") is True)


def build_ledger(repo: str = REPO) -> dict:
    last_green: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        rounds.append(n)
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if green(rec):
                last_green[name] = max(last_green.get(name, 0), n)
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json artifacts found")
    # restrict to the live registry: renamed/retired queries (e.g. the
    # r1 set_intersect/set_except pair folded into set_ops_nations)
    # would otherwise linger as false staleness alarms. Parse THAT
    # repo's registry source rather than importing — an import would
    # resolve to whichever kiji_mapreduce_spark copy is already loaded
    # or first on sys.path, not necessarily ``repo``'s (review finding).
    live = registry_names(repo)
    last_green = {q: r for q, r in last_green.items() if q in live}
    return {
        "as_of_round": max(rounds),
        "last_green": dict(sorted(last_green.items())),
    }


def registry_names(repo: str) -> set[str]:
    """Query names in ``repo``'s registry, read from source (same entry
    pattern test_window_boundary_comment pins)."""
    path = os.path.join(repo, "kiji_mapreduce_spark/suite/registry.py")
    src = open(path).read()
    start = src.index("\nQUERIES: dict")
    body = src[start:src.index("\nFIRST_WINDOW_REQUIRED", start)]
    return set(re.findall(r'^\s{4}"([a-z0-9_]+)":', body, re.M))


def main() -> int:
    ledger = build_ledger()
    out = os.path.join(REPO, "VERIFIED.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"VERIFIED.json: {len(ledger['last_green'])} queries, "
          f"as_of_round={ledger['as_of_round']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
