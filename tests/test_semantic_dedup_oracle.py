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


def test_cli_semantic_dedup(spark, tmp_path, capsys):
    """kiji-mr semantic-dedup end to end: verdict parquet + optional
    survivor table, stats JSON, loud missing-column error."""
    import json as _json

    import pytest as _pytest

    from kiji_mapreduce_spark import cli

    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]
    other = [0.0, 0.0, 1.0, 0.0]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, other)],
        "vec_id long, embedding array<float>")
    emb.write.parquet(f"{tmp_path}/emb")

    rc = cli.main(["semantic-dedup", "--input", f"{tmp_path}/emb",
                   "--output", f"{tmp_path}/verdict",
                   "--threshold", "0.95", "--k", "2",
                   "--survivors", f"{tmp_path}/kept"])
    assert rc == 0
    stats = _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_vectors"] == 4
    assert stats["n_dropped"] == 1  # vec 2 collapses into vec 1
    verdict = {r.vec_id: (r.keep_id, r.keep) for r in
               spark.read.parquet(f"{tmp_path}/verdict").collect()}
    assert verdict[2] == (1, False)
    assert verdict[1] == (1, True)
    kept = {r.vec_id for r in
            spark.read.parquet(f"{tmp_path}/kept").collect()}
    assert kept == {1, 3, 4}

    with _pytest.raises(SystemExit):
        cli.main(["semantic-dedup", "--input", f"{tmp_path}/emb",
                  "--output", f"{tmp_path}/v2", "--id-col", "nope"])
