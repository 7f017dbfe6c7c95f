"""Embedding clustering for corpus curation.

K-means over an ``array<float>`` embedding column — the workhorse behind
semantic domain discovery, cluster-balanced mixture design, and
cluster-level dedup/filtering in LLM data pipelines (the reference has
no clustering; this extends SURVEY §2's beyond-reference pipeline
layer).

Spark-first shape, sized for 100 TB:

- centroids are tiny (k x dim) and live as **driver-side literals**
  folded into the assignment expression — the classic k-means layout:
  the N-row corpus never shuffles for assignment (one codegen'd
  projection computes all k distances), only the (cluster, dim) partial
  sums shuffle for the update, k*dim rows total.
- the update aggregates with ``posexplode`` + partial aggregation
  (map-side combine): shuffle volume is O(partitions * k * dim),
  independent of corpus size.
- determinism: centroids are seeded from the k smallest ids and every
  centroid/distance is rounded before comparisons, so FP summation
  order (which varies with partitioning) can never flip an argmin —
  the property that makes the DuckDB oracle exact
  (``suite.SQL_KMEANS_CLUSTERS``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kmeans_assign(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id", k: int = 4, iters: int = 2,
                  round_digits: int = 6,
                  keep_vec: bool = False) -> DataFrame:
    """``kmeans_assign_with_dim`` without the dimension — see there."""
    return kmeans_assign_with_dim(df, vec_col=vec_col, id_col=id_col,
                                  k=k, iters=iters,
                                  round_digits=round_digits,
                                  keep_vec=keep_vec)[0]


def kmeans_assign_with_dim(
        df: DataFrame, vec_col: str = "embedding",
        id_col: str = "vec_id", k: int = 4, iters: int = 2,
        round_digits: int = 6,
        keep_vec: bool = False) -> tuple[DataFrame, int]:
    """Deterministic k-means: seed centroids from the ``k`` smallest-id
    vectors, run ``iters`` Lloyd rounds, return
    ((id, cluster, dist), corpus_dim) with dist rounded to 4 decimals.

    The second element is the corpus dimension the seed collect
    defined (0 when the input is empty) — callers that split their own
    valid/invalid rows by dimension (``dedup.semantic_dedup``) read it
    from here instead of paying a separate probe job (r13 verdict,
    the kmeans seed-collect pattern).

    Cluster labels are the seed vectors' ids. Ties in the argmin break
    toward the smaller label. Empty clusters drop out of later rounds
    (both engines compute centroids only from populated clusters).

    NULL, NULL-element, and ragged (wrong-dimension) vectors are
    DROPPED — they have no distance (the ``embedding_lsh_candidates``
    skip discipline; callers that must keep them, like
    ``semantic_dedup``, reattach them as their own survivors). A NULL
    among the k smallest ids previously crashed the seed collect, and
    one elsewhere silently assigned to the smallest label with NULL
    dist (r13 review finding, reproduced).
    """
    emb = df.select(
        id_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"))
    emb = emb.filter(F.col("_v").isNotNull()
                     & ~F.exists(F.col("_v"), lambda x: x.isNull()))
    if iters > 1:
        # each Lloyd round re-reads the vectors (update collect + next
        # assignment); pin them once instead of re-scanning the source
        # lineage ~2x per round
        emb = emb.localCheckpoint(eager=True)

    seeds = (emb.orderBy(id_col).limit(k).collect())
    # the dimension is DEFINED by the first (smallest-id) null-free
    # vector; ragged rows drop. Probed from the seed collect itself: a
    # separate first() job cost a full extra sort of the corpus (r13
    # bench flag, 0.98s -> 1.58s)
    if seeds:
        dim = len(seeds[0]["_v"])
        same = [r for r in seeds if len(r["_v"]) == dim]
        if len(same) < len(seeds):
            # ragged vectors sat among the k smallest ids: BACKFILL
            # seeds from the next same-dimension rows instead of
            # silently shrinking the effective k (ADVICE r13). The
            # second collect is paid only on ragged corpora — the
            # common all-same-dim path stays one seed job.
            seeds = (emb.filter(F.size("_v") == dim)
                     .orderBy(id_col).limit(k).collect())
        else:
            seeds = same
        emb = emb.filter(F.size("_v") == dim)
    if not seeds:
        # an empty input (everything filtered upstream) returns an
        # empty assignment frame instead of crashing on
        # array_min(array()) field extraction (r13 review finding,
        # confirmed; the pagerank n==0 discipline)
        id_type = dict(df.dtypes)[id_col]
        schema = (f"{id_col} {id_type}, cluster {id_type}, dist double"
                  + (f", {vec_col} array<double>" if keep_vec else ""))
        return df.sparkSession.createDataFrame([], schema), 0
    centroids = [(r[id_col], [round(x, round_digits) for x in r["_v"]])
                 for r in seeds]

    def _assign(frame: DataFrame) -> DataFrame:
        """Distance to every centroid in one projection; argmin via
        array_min over (dist, cid) structs (struct ordering = tie-break
        on cid). The k (dist, cid) struct expressions are generated SQL
        text — the Column-API form cost ~20 py4j round trips per
        centroid per iteration (see functions.lit_array); the parser
        yields the same zip_with/aggregate/round tree, with doubles as
        exact repr()D literals and int/string cids mapping to the same
        literal types F.lit produced."""

        def _cid_sql(v) -> str:
            if isinstance(v, str):
                esc = v.replace("\\", "\\\\").replace("'", "\\'")
                return f"'{esc}'"
            return str(int(v))

        structs = ", ".join(
            "struct(round(sqrt(aggregate(zip_with(_v, array("
            + ", ".join(f"{float(x)!r}D" for x in vec)
            + "), (a, b) -> (a - b) * (a - b)), 0.0D,"
            f" (acc, x) -> acc + x)), {round_digits}) AS dist,"
            f" {_cid_sql(cid)} AS cid)"
            for cid, vec in centroids)
        best = f"array_min(array({structs}))"
        return frame.selectExpr(
            id_col, "_v",
            f"{best}.cid AS cluster", f"{best}.dist AS dist")

    assigned = _assign(emb)
    for _ in range(iters - 1):
        # update: (cluster, dim) partial means — k*dim shuffle rows
        new_rows = (assigned
                    .select("cluster", F.posexplode("_v").alias("pos", "x"))
                    .groupBy("cluster", "pos")
                    .agg(F.avg("x").alias("m"))
                    .groupBy("cluster")
                    .agg(F.array_sort(F.collect_list(
                        F.struct("pos", "m"))).alias("pm"))
                    .select("cluster", F.transform(
                        "pm", lambda s: F.round(s["m"], round_digits))
                        .alias("cv"))
                    .collect())
        centroids = [(r["cluster"], list(r["cv"])) for r in new_rows]
        centroids.sort(key=lambda t: t[0])
        assigned = _assign(emb)
    # cluster labels are seed-vector ids, so they follow the id
    # column's type (a hardcoded long cast crashed string ids under
    # ANSI — review follow-up)
    id_type = dict(df.dtypes)[id_col]
    cols = [id_col, F.col("cluster").cast(id_type).alias("cluster"),
            F.round("dist", 4).alias("dist")]
    if keep_vec:
        # downstream consumers (semantic_dedup) need the vectors the
        # assignment already materialized — re-scanning the source and
        # shuffle-joining them back was the job's largest data movement
        # (review finding)
        cols.append(F.col("_v").alias(vec_col))
    return assigned.select(*cols), dim
