"""Cross-engine evidence for the semantic-dedup seat (the C4/DSIR
precedent: commit the DuckDB cross-check first, seat when a window
slot opens): the full SemDeDup chain — deterministic k-means
assignment, within-cluster 6dp-rounded cosine pairs, connected
components to the group-minimum survivor — vs an independent SQL
replay whose transitive closure runs as a recursive CTE."""

import duckdb

from kiji_mapreduce_spark.suite.queries_vectors import (
    SQL_SEMANTIC_DEDUP, q_semantic_dedup)

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    return sorted((int(r[0]), int(r[1]), int(r[2]), bool(r[3]))
                  for r in con.execute(SQL_SEMANTIC_DEDUP).fetchall())


def test_semantic_dedup_matches_duckdb_oracle(spark):
    got = sorted((r.vec_id, r.cluster, r.keep_id, r.keep)
                 for r in q_semantic_dedup(spark, SF_DIR).collect())
    want = _duck(SF_DIR)
    assert len(got) == len(want)
    assert got == want

    # the fixture actually dedups: some rows lose, survivors are the
    # group minima, and every loser's keep_id is a kept row
    losers = [(v, k) for v, _, k, keep in got if not keep]
    assert losers, "no near-dup groups at threshold 0.4"
    kept_ids = {v for v, _, _, keep in got if keep}
    for v, k in losers:
        assert k in kept_ids and k < v
