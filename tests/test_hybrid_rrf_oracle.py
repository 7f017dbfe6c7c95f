"""Cross-engine evidence for the hybrid-retrieval RRF seat (the
C4/DSIR precedent: commit the DuckDB cross-check first, seat when a
window slot opens): BM25 top-k text retrieval + exact-cosine top-k
vector retrieval fused by Reciprocal Rank Fusion (Cormack, Clarke &
Büttcher, SIGIR 2009 — sum(1/(k0+rank)), k0=60), against an
independent SQL replay of both retrievers and the fusion."""

import duckdb
import pytest

from kiji_mapreduce_spark.pipeline.search import rrf_fuse
from kiji_mapreduce_spark.suite.queries_vectors import (
    SQL_HYBRID_RRF, q_hybrid_search_rrf)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    return sorted((int(a), int(b), float(c), int(d))
                  for a, b, c, d in con.execute(SQL_HYBRID_RRF)
                  .fetchall())


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_hybrid_rrf_matches_duckdb_oracle(spark, sf_dir):
    got = sorted((r.query_id, r.doc_id, r.rrf_score, r.rank)
                 for r in q_hybrid_search_rrf(spark, sf_dir).collect())
    want = _duck(sf_dir)
    assert len(got) == len(want) == 50  # 5 queries x top-10
    assert got == want

    # the fixture actually FUSES: at least one fused top-10 doc must
    # carry contributions from both lists (score > max single-list
    # contribution 1/61), and the self-doc (which BM25 alone would
    # rank near the top) must not win rank 1 for every query — the
    # vector list demonstrably influences the final order
    assert any(score > 1.0 / 61 + 1e-9 for _, _, score, _ in got)
    assert any(qid != doc for qid, doc, _, rank in got if rank == 1)


def test_rrf_fuse_semantics(spark):
    """Hand-checkable fixture: doc B 2nd in both lists beats doc A
    1st in one list only (1/62+1/62 > 1/61); absent docs contribute
    nothing; ties break on doc id; topn truncates."""
    l1 = spark.createDataFrame(
        [(1, "A", 1), (1, "B", 2), (1, "C", 3)],
        "query_id int, doc_id string, rank int")
    l2 = spark.createDataFrame(
        [(1, "D", 1), (1, "B", 2)],
        "query_id int, doc_id string, rank int")
    out = {r.doc_id: (r.rrf_score, r.rank)
           for r in rrf_fuse([l1, l2], k0=60, topn=3).collect()}
    assert set(out) == {"A", "B", "D"}  # C (rank 4 by score) truncated
    assert out["B"][1] == 1 and out["B"][0] == round(2 / 62, 6)
    # A and D tie at 1/61 -> doc id ascending breaks it
    assert (out["A"][1], out["D"][1]) == (2, 3)

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
