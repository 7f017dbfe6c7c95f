"""Cross-engine evidence for the robots-filter r14 oracle seat (the
C4/DSIR precedent: commit the DuckDB cross-check first, seat when a
window slot opens): the full REP-compliance chain — synthesized
per-host robots.txt bytes through the REAL ``robots_rules`` fold and
the REAL ``filter_robots_disallowed`` longest-match join, wildcards
included — against an independent SQL replay of the expected rule
table and decision procedure."""

import duckdb
import pytest

from kiji_mapreduce_spark.suite.queries_text import (_ROBOTS_PATHS,
                                                     SQL_ROBOTS_FILTER,
                                                     q_robots_filter)

SF_DIR = "/root/testdata/sf0.001"


def test_robots_filter_matches_duckdb_oracle(spark):
    got = sorted((r.doc_id, r.url)
                 for r in q_robots_filter(spark, SF_DIR).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = sorted((int(r[0]), r[1])
                  for r in con.execute(SQL_ROBOTS_FILTER).fetchall())
    assert got == want

    # the fixture actually exercises the filter: some docs dropped,
    # some kept, and the odd-host rule makes survivors host-varying
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs
    kept_by_path = {}
    for doc_id, url in got:
        p = url.split(".example.com", 1)[1]
        kept_by_path.setdefault(p, set()).add(doc_id % 8)
    # /odd paths survive on even hosts and host 7 only
    for p in ("/odd", "/odd/page"):
        assert kept_by_path[p] == {0, 2, 4, 6, 7}
    # wildcard $ anchor: .tmp blocked (except robots-less host 7),
    # .tmp.bak kept everywhere
    assert kept_by_path["/cache/file.tmp"] == {7}
    assert kept_by_path["/cache/file.tmp.bak"] == set(range(8))
    # tie goes to allow; longer allow overrides; wildcard outranks
    # the shorter allow
    assert kept_by_path["/tie/page"] == set(range(8))
    assert kept_by_path["/private/ok/page.html"] == set(range(8))
    assert kept_by_path["/a/path/mid"] == {7}
    assert kept_by_path["/private"] == {7}


def test_robots_filter_paths_cover_all_classes():
    """The path list is the oracle's coverage contract — pin its
    size (the doc_id % 12 arithmetic) and uniqueness."""
    assert len(_ROBOTS_PATHS) == 12
    assert len(set(_ROBOTS_PATHS)) == 12
