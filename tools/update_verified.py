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


def registry_order(repo: str) -> list[str]:
    """Query names in ``repo``'s registry IN DICT ORDER, read from
    source (same entry pattern test_window_boundary_comment pins)."""
    path = os.path.join(repo, "kiji_mapreduce_spark/suite/registry.py")
    src = open(path).read()
    start = src.index("\nQUERIES: dict")
    body = src[start:src.index("\nFIRST_WINDOW_REQUIRED", start)]
    return re.findall(r'^\s{4}"([a-z0-9_]+)":', body, re.M)


def registry_names(repo: str) -> set[str]:
    return set(registry_order(repo))


def registry_pending(repo: str) -> dict[str, int]:
    """NEW_PENDING_WINDOW entries, read from source like the others."""
    path = os.path.join(repo, "kiji_mapreduce_spark/suite/registry.py")
    src = open(path).read()
    start = src.index("NEW_PENDING_WINDOW: dict[str, int] = {")
    body = src[start:src.index("}", start)]
    return {name: int(rnd) for name, rnd in
            re.findall(r'"([a-z0-9_]+)":\s*(\d+)', body)}


WINDOW_SIZE = 50


def required_window(ledger: dict, order: list[str],
                    pending: dict[str, int] | None = None,
                    window_size: int = WINDOW_SIZE) -> list[str]:
    """The queries that MUST occupy next round's first-``window_size``
    slots, stalest-first: never-verified queries (new this round,
    minus a still-valid NEW_PENDING_WINDOW exemption), then everything
    whose last green round is ``as_of_round - 1`` or older — one more
    round outside the window would breach the 2-round freshness cap.

    This is the mechanical form of the registry's ordering policy; the
    r9 no-op round proved comment discipline alone strands the rotation
    (the window re-verified r8's set verbatim while 50 tail queries
    aged past the cap). tests/test_suite_smoke.py asserts the committed
    QUERIES prefix contains this set, and main() prints it so a round's
    first command shows the exact rotation to commit.
    """
    pending = pending or {}
    as_of = ledger["as_of_round"]
    next_round = as_of + 1
    last_green = ledger["last_green"]
    must = [
        q for q in order
        if (q not in last_green and pending.get(q) != next_round)
        or (q in last_green and last_green[q] <= as_of - 1)]
    if len(must) > window_size:
        raise SystemExit(
            f"{len(must)} queries need verification slots but the "
            f"window holds {window_size}: the rotation fell more than "
            "a round behind — split the backlog across rounds by "
            "driving the overflow locally (tools/check_correctness.py) "
            "and documenting it")
    # stalest first inside the window (never-verified = round 0)
    return sorted(must, key=lambda q: (last_green.get(q, 0),
                                       order.index(q)))


def main() -> int:
    ledger = build_ledger()
    out = os.path.join(REPO, "VERIFIED.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"VERIFIED.json: {len(ledger['last_green'])} queries, "
          f"as_of_round={ledger['as_of_round']}")
    order = registry_order(REPO)
    required = required_window(ledger, order, registry_pending(REPO))
    window = order[:WINDOW_SIZE]
    missing = [q for q in required if q not in window]
    print(f"next-round window must contain {len(required)} queries "
          f"(stalest-first): {' '.join(required) or '(none)'}")
    if missing:
        print(f"NOT in the current first-{WINDOW_SIZE} prefix "
              f"(rotate these in): {' '.join(missing)}")
        return 1
    print(f"current first-{WINDOW_SIZE} prefix already satisfies the "
          "rotation")
    return 0


if __name__ == "__main__":
    sys.exit(main())
