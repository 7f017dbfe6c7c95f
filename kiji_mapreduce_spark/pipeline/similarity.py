"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; LSH bucketing is the scale
path (probe only same-bucket candidates — at 100 TB the cross join is the
bottleneck, so the bucketed variant turns O(N*Q) into O(N*Q/buckets) with
recall traded via band count).

All dot products / norms are computed JVM-side with ``zip_with`` +
``aggregate`` — no Python in the hot path. Two negative results worth
keeping (both measured at sf0.1, r13):

- These higher-order folds are NOT whole-stage-codegen'd, but for
  double arithmetic the HigherOrderFunction evaluator JITs well and is
  the right form: an unrolled fixed-dim alternative (64 ``F.get``
  products summed into one giant expression) measured **8.4x slower**
  on the 4M-pair self-join (median 11.28 s vs 1.34 s, warmed,
  bit-identical sums). The interpreted-lambda hazard that justified
  the DSIR featurize rewrite is about per-element ALLOCATION
  (string/array construction), not folds over numerics.
- Hoisting ``sq8_topk``'s per-vector cast+norms out of the pair
  expression (the ``embedding_near_duplicates`` trick) LOST 0.4 s:
  its pair stage is a broadcast nested-loop join, so hoisting swaps
  five cheap int-array folds per pair for a pre-materialized
  64-double array on every streamed row — row width costs more than
  the folds. Hoist per-vector work only when candidates join back to
  a narrow vector table by equi-join (near-dups, brute force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from kiji_mapreduce_spark.functions import (lit_array, lit_array_sql,
                                            local_table, salted_topk)


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


# -- generated-SQL twins of the fold helpers ---------------------------------
#
# Each Column-API lambda above costs tens of py4j driver round trips to
# construct, and the ANN paths build them per plane / per select — the
# construction (not execution) of knn_lsh_topk measured ~1 s/call after
# the r14 batch-5 pass. These twins emit the SAME expressions as SQL
# text, so a whole projection parses in ONE round trip (the
# dedup._perm_min_exprs precedent). The SQL parser yields identical
# Catalyst trees (same fold structure, same literal types), so results
# are unchanged — re-proven against the DuckDB oracles after the
# rewrite. Inputs are SQL fragments; quote raw column names with
# ``quote_col`` first.

def quote_col(name: str) -> str:
    """Backtick-quote an identifier for embedding in generated SQL."""
    return "`" + name.replace("`", "``") + "`"


def as_double_sql(vec: str) -> str:
    return f"transform({vec}, x -> CAST(x AS DOUBLE))"


def dot_sql(a: str, b: str) -> str:
    """Sequential left-to-right fold — deterministic accumulation order."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
            f"(acc, x) -> acc + x)")


def l2_norm_sql(a: str) -> str:
    return (f"sqrt(aggregate(transform({a}, x -> x * x), 0.0D, "
            f"(acc, x) -> acc + x))")


def cosine_guarded_sql(a: str, b: str, denom: str | None = None) -> str:
    """Zero-norm-guarded cosine (see ``cosine``): ``denom`` can name a
    precomputed ``norm_a * norm_b`` product column; otherwise the norms
    fold inline, exactly like the Column form."""
    d = denom or f"({l2_norm_sql(a)} * {l2_norm_sql(b)})"
    return (f"CASE WHEN {d} != 0 THEN {dot_sql(a, b)} / {d} "
            f"ELSE 0.0D END")


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, zero-norm safe: an all-zero (or empty)
    embedding scores 0.0 against everything. Without the guard, Spark
    4's default ANSI mode aborts the whole job with DIVIDE_BY_ZERO on
    one bad vector, and with ANSI off the NaN result sorts ABOVE every
    real cosine, ranking the zero vector as the best neighbor of every
    query (r5 review finding, both verified empirically)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    (huge) corpus — one scan of the corpus, no shuffle until the final
    per-query top-k (tiny). Returns (query_id, neighbor_id, cosine, rank).
    """
    # norms fold once per VECTOR (query norms would otherwise re-fold
    # once per corpus row); the division is unchanged arithmetic, so
    # results are bit-identical while the per-pair work drops from
    # three interpreted folds to one. All projections are generated SQL
    # (one parse each) — the Column-lambda forms cost tens of py4j
    # round trips per fold on every construction.
    v = as_double_sql(quote_col(vec_col))
    q = queries.selectExpr(
        f"{quote_col(id_col)} AS {quote_col(query_id_col)}",
        f"{v} AS _qvec",
        f"{l2_norm_sql(v)} AS _qn",
    )
    corpus = embeddings.selectExpr(
        f"{quote_col(id_col)} AS neighbor_id",
        f"{v} AS _cvec",
        f"{l2_norm_sql(v)} AS _cn")
    cos = F.expr(cosine_guarded_sql("_qvec", "_cvec", "(_qn * _cn)"))
    scored = (
        corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", cos.alias("_cos"))
    )
    # skew-safe two-phase top-k: a plain per-query window would hold the
    # ENTIRE corpus's scores for one query in one task — at 100x corpus
    # that task is the straggler. salted_topk's local-then-global ranking
    # is exact (any global top-k row survives its salt's local top-k) and
    # the (score desc, neighbor_id) order is unchanged, so ranks — and
    # oracle hashes — are identical to the single-window plan.
    return (
        salted_topk(scored, query_id_col, "_cos", k,
                    tiebreak_cols=["neighbor_id"], salt_cols=["neighbor_id"])
        .select(query_id_col, "neighbor_id", F.col("_cos").alias("cosine"), "rank")
    )


def _plane(seed: int, p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim (seeded PRNG;
    no RNG state crosses the driver/executor boundary — the plane ships as
    a literal array constant)."""
    import random

    rnd = random.Random(seed * 1000003 + p)
    return [rnd.uniform(-1.0, 1.0) for _ in range(dim)]


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8,
    seed: int = 42, dim: int | None = None,
) -> DataFrame:
    """SimHash-style LSH bucketing: sign pattern against ``n_planes``
    pseudo-random hyperplanes -> integer bucket id column ``bucket``.
    Planes are literal constants — per row the work is n_planes dot
    products, nothing else. The whole bucket expression (every plane's
    literal array and fold) is ONE generated SQL string parsed in one
    round trip; the per-plane Column loop cost ~100s of py4j calls per
    construction (r14 batch 6). ``_plane`` output is always finite, so
    the literal arrays are always SQL-expressible."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = first["d"] if first else 0
    v = as_double_sql(quote_col(vec_col))
    bucket = "CAST(0 AS BIGINT)"
    for p in range(n_planes):
        comps = lit_array_sql(_plane(seed, p, dim), "double")
        sign_bit = f"CAST(({dot_sql(v, comps)}) >= 0 AS BIGINT)"
        bucket = f"({bucket} * 2 + {sign_bit})"
    return df.withColumn("bucket", F.expr(bucket))


def label_cosine_stats(embeddings: DataFrame, label_col: str = "label",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Within-group pairwise-cosine stats via a vectorized Pandas UDF.

    Pairwise scoring inside a bounded group is the textbook Arrow/numpy
    case: one 200x64 matrix multiply replaces 20k interpreted expression
    evaluations. Groups must fit in executor memory (they're clusters, so
    they do); the groupBy shuffles only (id, label, vector).
    """
    import numpy as np
    import pandas as pd

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        iu = np.triu_indices(len(m), k=1)
        if len(iu[0]) == 0:
            # a singleton group has no pairs: emit nothing, matching the
            # SQL mirror (whose pair self-join yields no row) — calling
            # .max() on the empty slice raised ValueError and killed the
            # job for one lone cluster (r5 review finding)
            return pd.DataFrame({"label": [], "n_pairs": [],
                                 "max_cosine": [], "avg_cosine": []})
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        # a zero-norm vector must score cosine 0.0 against everything,
        # matching the guarded `cosine` expression (r5) and the SQL
        # mirror — dividing by the raw norm turns the whole group's
        # stats NaN instead (r13 review finding)
        norms[norms == 0.0] = np.inf
        cos = (m / norms) @ (m / norms).T
        vals = cos[iu]
        # no rounding here: double rounding (python banker's then SQL
        # HALF_UP) flips values sitting on a rounding boundary
        return pd.DataFrame({
            "label": [pdf[label_col].iloc[0]],
            "n_pairs": [len(vals)],
            "max_cosine": [float(vals.max())],
            "avg_cosine": [float(vals.mean())],
        })

    # the output schema follows the ACTUAL label column type — it was
    # hardcoded 'label int', breaking any non-integer label_col
    # (r5 review finding)
    label_type = dict(embeddings.dtypes)[label_col]
    return embeddings.select(label_col, id_col, vec_col).groupBy(
        label_col).applyInPandas(
            _stats,
            f"label {label_type}, n_pairs long, "
            "max_cosine double, avg_cosine double")


def _fit_ivf_quantizer(embeddings: DataFrame, id_col: str, vec_col: str,
                       n_centroids: int, seed: int, max_iter: int = 5):
    """Fit the IVF coarse quantizer ONCE (one MLlib KMeans fit) and
    return (indexed, centers_df): the corpus with its cell assignment
    as (neighbor_id, _cvec, _cell), and the centers as a plain
    (_cell, _center) table. Shared by ``ivf_topk`` and ``ann_tune`` so
    the tuner's recommended settings are measured against the SAME
    quantizer recipe the search operator runs (r13 review finding: the
    two fits had drifted into near-verbatim copy-paste)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = embeddings.selectExpr(
        f"{quote_col(id_col)} AS neighbor_id",
        f"{as_double_sql(quote_col(vec_col))} AS _cvec")
    with_vec = corpus.withColumn("_features", array_to_vector("_cvec"))
    km = (KMeans(k=n_centroids, seed=seed, maxIter=max_iter,
                 featuresCol="_features", predictionCol="_cell")
          .fit(with_vec))
    indexed = km.transform(with_vec).select("neighbor_id", "_cvec",
                                            "_cell")
    centers_df = local_table(
        embeddings.sparkSession,
        [(i, [float(x) for x in c])
         for i, c in enumerate(km.clusterCenters())],
        "_cell int, _center array<double>")
    return indexed, centers_df


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    n_centroids: int = 8, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 42, max_iter: int = 5,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    cells, then search only the ``nprobe`` cells nearest each query.

    The scale path for ANN when LSH recall is too blunt: the index build
    is one MLlib KMeans fit (itself sampled/distributed), corpus
    assignment is a narrow pass, and each query probes
    ``nprobe/n_centroids`` of the corpus via an equi-join on cell id.
    Returns (query_id, neighbor_id, cosine, rank).

    ``centroids`` (optional): a (_cell int, _center array<double>)
    DataFrame of pre-chosen cell centers — FAISS's "train once, reuse the
    quantizer" mode. Skips the KMeans fit; corpus rows are assigned to
    their nearest given centroid (squared-L2, ties to the lowest cell).
    With deterministic centroids the whole query is reproducible in any
    SQL engine — the suite uses this for its DuckDB oracle.
    """
    corpus = embeddings.selectExpr(
        f"{quote_col(id_col)} AS neighbor_id",
        f"{as_double_sql(quote_col(vec_col))} AS _cvec")
    d2_to = {
        src: F.expr(f"aggregate(zip_with({src}, _center, "
                    f"(a, b) -> (a - b) * (a - b)), 0.0D, "
                    f"(acc, x) -> acc + x)")
        for src in ("_cvec", "_qvec")}
    if centroids is None:
        indexed, centers_df = _fit_ivf_quantizer(
            embeddings, id_col, vec_col, n_centroids, seed, max_iter)
    else:
        centers_df = centroids.select("_cell", "_center")
        assign_w = Window.partitionBy("neighbor_id").orderBy(
            F.col("_d2"), F.col("_cell"))
        indexed = (corpus.crossJoin(F.broadcast(centers_df))
                   .withColumn("_d2", d2_to["_cvec"])
                   .withColumn("_rn", F.row_number().over(assign_w))
                   .filter(F.col("_rn") == 1)
                   .select("neighbor_id", "_cvec", "_cell"))

    # nprobe nearest cells per query: centers are tiny -> broadcast,
    # distance ranked per query
    v = as_double_sql(quote_col(vec_col))
    q = queries.selectExpr(
        f"{quote_col(id_col)} AS query_id", f"{v} AS _qvec",
        f"{l2_norm_sql(v)} AS _qn")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_d2"), F.col("_cell"))
    probes = (q.crossJoin(F.broadcast(centers_df))
              .withColumn("_d2", d2_to["_qvec"])
              .withColumn("_pr", F.row_number().over(probe_w))
              .filter(F.col("_pr") <= nprobe)
              .select("query_id", "_qvec", "_qn", "_cell"))

    # per-vector norm reuse (see brute_force_topk): corpus norms fold
    # once in the indexed table, query norms once in the probe table
    indexed_n = indexed.withColumn("_cn", F.expr(l2_norm_sql("_cvec")))
    cos = F.expr(cosine_guarded_sql("_qvec", "_cvec", "(_qn * _cn)"))
    scored = (indexed_n.join(F.broadcast(probes), on="_cell")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", cos.alias("cosine")))
    # skew-safe two-phase top-k (the brute_force_topk discipline): at
    # nprobe/n_centroids coverage each query's candidate set grows with
    # the corpus, so a plain per-query window is the same straggler
    # hazard the salted form exists to prevent. Order and tie-break are
    # unchanged — ranks, and oracle hashes, are identical.
    return salted_topk(scored, "query_id", "cosine", k,
                       tiebreak_cols=["neighbor_id"],
                       salt_cols=["neighbor_id"])


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, seed: int = 42, n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    At scale: corpus bucketing is a one-off narrow pass; the candidate
    join is an equi-join on ``(probe, bucket)`` (shuffle-partitioned, no
    cross join). Recall < 1.0 by construction; raise ``n_planes`` for
    smaller buckets, or ``n_probes`` for multi-probe (each probe is an
    independent hyperplane family — candidates union across probes,
    recall rises roughly geometrically with probes).
    """
    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"] if dim_row else 0

    def _bucketed(df, alias_id):
        v = as_double_sql(quote_col(vec_col))
        parts = []
        for p in range(n_probes):
            b = random_hyperplane_buckets(
                df, vec_col, n_planes, seed + 7919 * p, dim)
            parts.append(b.selectExpr(
                f"{quote_col(id_col)} AS {quote_col(alias_id)}",
                f"{v} AS {quote_col(f'_{alias_id}_v')}",
                f"{l2_norm_sql(v)} AS {quote_col(f'_{alias_id}_n')}",
                f"{p} AS probe", "bucket"))
        out = parts[0]
        for more in parts[1:]:
            out = out.unionByName(more)
        return out

    corpus = _bucketed(embeddings, "neighbor_id")
    q = _bucketed(queries, "query_id")
    # dedup multi-probe pairs BEFORE the cosine projection: vectors are
    # identical for the same ids, so scoring once per DISTINCT pair
    # (instead of once per probe that co-buckets it, then discarding
    # n_probes-1 of the results) gives identical output for up to
    # n_probes x less fold work (r13 review finding)
    cands = (
        corpus.join(F.broadcast(q), on=["probe", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id",
        F.expr(cosine_guarded_sql(
            "_query_id_v", "_neighbor_id_v",
            "(_query_id_n * _neighbor_id_n)")).alias("cosine"))
    # skew-safe two-phase top-k: a boilerplate-heavy corpus collapses
    # into one hot bucket, so the candidate set per query scales with
    # the corpus — same salted discipline as brute_force/ivf/pq/sq8
    return salted_topk(scored, "query_id", "cosine", k,
                       tiebreak_cols=["neighbor_id"],
                       salt_cols=["neighbor_id"])


# -- product quantization (PQ) ANN ------------------------------------------

def _pq_d2_batch(x, mats, ds):
    """Per-subspace squared L2 from an (n, dim) float64 batch to each
    codebook center: list of (n, K_m) arrays. The inner accumulation is
    an EXPLICIT j-loop so the float64 addition order is the sequential
    left-to-right fold — bit-identical to the SQL ``list_reduce`` the
    DuckDB oracle runs (numpy's .sum() would use pairwise summation)."""
    import numpy as np

    out = []
    for m, c in enumerate(mats):
        sub = x[:, m * ds:(m + 1) * ds]
        diff = sub[:, None, :] - c[None, :, :]        # (n, K_m, ds)
        d2 = np.zeros(diff.shape[:2])
        for j in range(ds):
            d2 += diff[:, :, j] * diff[:, :, j]
        out.append(d2)
    return out


def fit_pq_codebooks(
    embeddings: DataFrame, n_subspaces: int = 8, n_codes: int = 16,
    vec_col: str = "embedding", seed: int = 42, max_iter: int = 5,
) -> list[list[list[float]]]:
    """Train PQ codebooks: an independent KMeans per subspace (the
    classic product-quantization fit, Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" — public method). Returns
    ``codebooks[m][code] = center`` (n_subspaces x n_codes x dim/m).

    Each fit is an MLlib KMeans over ONE slice of the vectors —
    sampled/distributed like any MLlib fit, and the result is tiny
    (m*k*(dim/m) floats), so it ships to executors as literals."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"] if dim_row else 0
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    ds = dim // n_subspaces
    v = as_double_sql(quote_col(vec_col))
    books = []
    for m in range(n_subspaces):
        sub = embeddings.select(
            array_to_vector(
                F.expr(f"slice({v}, {m * ds + 1}, {ds})")).alias("_f"))
        km = KMeans(k=n_codes, seed=seed + m, maxIter=max_iter,
                    featuresCol="_f", predictionCol="_c").fit(sub)
        books.append([[float(x) for x in c] for c in km.clusterCenters()])
    return books


def pq_encode(
    embeddings: DataFrame, codebooks: list[list[list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-codebook-entry
    codes: (id, _codes array<int>), 1-based codes, ties to the lowest
    code (first-position argmin).

    This IS the PQ index: dim doubles collapse to n_subspaces small
    ints per row (64x compression at 64-dim/8-subspace/16-code).
    The encode is one Arrow-batched numpy pass (a literal-center
    expression tree of n_subspaces x n_codes fold-d2s is interpreted
    row-at-a-time by Catalyst — ~3 orders of magnitude slower); the
    j-loop accumulation keeps it bit-identical to the sequential-fold
    semantics the DuckDB oracle computes. No shuffle — materialize the
    codes once and top-k scans never read raw vectors again."""
    ds = len(codebooks[0][0])
    mats = [np.array(b, dtype=np.float64) for b in codebooks]

    @F.pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        x = np.vstack(v.to_numpy()).astype(np.float64)
        cols = [d2.argmin(axis=1) + 1 for d2 in _pq_d2_batch(x, mats, ds)]
        return pd.Series(list(np.stack(cols, axis=1).astype(np.int32)))

    return embeddings.select(
        F.col(id_col).alias("neighbor_id"), _codes(vec_col).alias("_codes"))


def pq_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    n_subspaces: int = 8, n_codes: int = 16, refine: int = 4,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
) -> DataFrame:
    """PQ approximate top-k with ADC scoring and exact re-rank.

    Scale shape: the corpus is scanned as CODES (n_subspaces ints/row);
    each query precomputes a distance table (n_subspaces x n_codes
    squared distances to its subvectors) and a candidate's approximate
    distance is n_subspaces table lookups — no full-dim arithmetic on
    the big side, no shuffle of vectors. The approx top ``refine*k``
    per query then re-ranks by exact cosine (only that sliver re-reads
    real vectors). Returns (query_id, neighbor_id, cosine, rank).

    Approximate distances and cosines are rounded to 6 dp before
    ranking (ties then break on neighbor_id), which makes the rank
    order engine-independent — the DuckDB oracle reproduces it exactly
    when given the same literal codebooks.
    """
    if codebooks is None:
        codebooks = fit_pq_codebooks(
            embeddings, n_subspaces, n_codes, vec_col, seed)
    ds = len(codebooks[0][0])
    mats = [np.array(b, dtype=np.float64) for b in codebooks]
    codes = pq_encode(embeddings, codebooks, id_col, vec_col)

    @F.pandas_udf("array<array<double>>")
    def _dtabs(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        x = np.vstack(v.to_numpy()).astype(np.float64)
        d2s = _pq_d2_batch(x, mats, ds)
        return pd.Series([[d2s[m][i].tolist() for m in range(len(mats))]
                          for i in range(len(x))])

    q = queries.select(
        F.expr(f"{quote_col(id_col)} AS query_id"),
        F.expr(f"{as_double_sql(quote_col(vec_col))} AS _qvec"),
        _dtabs(vec_col).alias("_dt"))

    approx_d2 = F.expr(
        "round(aggregate(zip_with(_codes, _dt, (c, t) -> get(t, c - 1)), "
        "0.0D, (acc, x) -> acc + x), 6)")
    # candidate ranking spans the FULL code corpus per query — the one
    # window in this path that grows with corpus size, so it goes through
    # the skew-safe two-phase salted_topk (exact: same order, same ties;
    # the exact re-rank window below only ever sees refine*k rows/query)
    cands = (salted_topk(
        codes
        .join(F.broadcast(q.select("query_id", "_dt")),
              F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_ad2", approx_d2),
        "query_id", "_ad2", refine * k, ascending=True,
        tiebreak_cols=["neighbor_id"], salt_cols=["neighbor_id"])
        .select("query_id", "neighbor_id"))

    corpus_v = embeddings.selectExpr(
        f"{quote_col(id_col)} AS neighbor_id",
        f"{as_double_sql(quote_col(vec_col))} AS _cvec")
    exact = (corpus_v.join(F.broadcast(cands), on="neighbor_id")
             .join(F.broadcast(q.select("query_id", "_qvec")), on="query_id")
             .select("query_id", "neighbor_id",
                     F.expr(f"round({cosine_guarded_sql('_qvec', '_cvec')}, "
                            f"6)").alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def sq8_encode(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    out_col: str = "_codes",
) -> DataFrame:
    """Scalar int8 quantization (SQ8): per-vector scale = max|x| / 127,
    codes = round(x / scale) in [-127, 127] -> (id, scale, codes).

    Pure codegen'd projection — at 100 TB this is the point: the corpus
    is SCANNED AND STORED as ~4x-smaller int codes, and because cosine
    is scale-invariant the approximate score needs only the codes (the
    per-vector scale cancels out of the ratio), so scoring never touches
    the float vectors. All-zero vectors encode to all-zero codes (scale
    guard) and score 0 through ``cosine``'s zero-norm guard."""
    v = as_double_sql(quote_col(vec_col))
    s = f"(array_max(transform({v}, x -> abs(x))) / 127.0D)"
    safe = f"(CASE WHEN {s} != 0 THEN {s} ELSE 1.0D END)"
    codes = f"transform({v}, x -> CAST(round(x / {safe}) AS INT))"
    return df.selectExpr(f"{quote_col(id_col)} AS neighbor_id",
                         f"{s} AS _scale",
                         f"{codes} AS {quote_col(out_col)}")


def sq8_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    refine: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 approximate top-k with exact re-rank: approximate cosine over
    int8 codes (scale-free — SQ8's scale factor cancels in the cosine
    ratio), top ``refine*k`` candidates per query, exact-cosine re-rank
    of only that sliver. Returns (query_id, neighbor_id, cosine, rank).

    Same engine-independence discipline as ``pq_topk``: approximate
    cosines are rounded to 6 dp before candidate ranking (ties break on
    neighbor_id), and code dot products are exact small-integer sums, so
    the DuckDB oracle reproduces the candidate set bit-for-bit."""
    codes = sq8_encode(embeddings, id_col, vec_col)
    qcodes = (sq8_encode(queries, id_col, vec_col, out_col="_qcodes")
              .select(F.col("neighbor_id").alias("query_id"), "_qcodes"))
    approx = F.expr(
        f"round({cosine_guarded_sql(as_double_sql('_qcodes'), as_double_sql('_codes'))}, 6)")
    # same scale shape as pq_topk's candidate stage: the approx ranking
    # spans the full code corpus per query, so it is two-phase salted —
    # one task never holds a whole query's candidate scores
    cands = (salted_topk(
        codes
        .join(F.broadcast(qcodes),
              F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_ac", approx),
        "query_id", "_ac", refine * k, tiebreak_cols=["neighbor_id"], salt_cols=["neighbor_id"])
        .select("query_id", "neighbor_id"))

    q = queries.selectExpr(f"{quote_col(id_col)} AS query_id",
                           f"{as_double_sql(quote_col(vec_col))} AS _qvec")
    corpus_v = embeddings.selectExpr(
        f"{quote_col(id_col)} AS neighbor_id",
        f"{as_double_sql(quote_col(vec_col))} AS _cvec")
    exact = (corpus_v.join(F.broadcast(cands), on="neighbor_id")
             .join(F.broadcast(q), on="query_id")
             .select("query_id", "neighbor_id",
                     F.expr(f"round({cosine_guarded_sql('_qvec', '_cvec')}, "
                            f"6)").alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_recall(
    approx: DataFrame, exact: DataFrame,
    query_col: str = "query_id", neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Recall@k of an approximate KNN result against the exact one ->
    (query_id, n_exact, n_hits, recall) per query.

    The standard ANN quality gate (FAISS-style recall eval), run
    IN-ENGINE so index parameters (nprobe, bands, codebooks) can be
    tuned on a cluster-scale sample without exporting results: recall =
    |approx ∩ exact| / |exact| per query, where both inputs are
    (query, neighbor, ...) top-k tables from any pair of this module's
    search paths (``ivf_topk``/``lsh_topk``/``pq_topk``/``sq8_topk`` vs
    ``brute_force_topk``).

    Scale shape: both sides are k rows per query — O(k·|Q|), already
    reduced from the corpus by the searches themselves. One equi-join
    on (query, neighbor) and one grouped count; the corpus is never
    touched.
    """
    e = exact.select(F.col(query_col).alias("query_id"),
                     F.col(neighbor_col).alias("neighbor_id"))
    a = (approx.select(F.col(query_col).alias("query_id"),
                       F.col(neighbor_col).alias("neighbor_id"))
         .distinct()
         .withColumn("_hit", F.lit(1)))
    return (e.join(a, on=["query_id", "neighbor_id"], how="left")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 F.sum(F.coalesce("_hit", F.lit(0)))
                 .cast("long").alias("n_hits"))
            .withColumn("recall",
                        F.round(F.col("n_hits") / F.col("n_exact"), 4)))


def ann_tune(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    index: str = "ivf", grid: list[int] | None = None,
    n_centroids: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> list[dict]:
    """Grid-search one ANN index parameter against exact recall@k —
    the FAISS-style "sweep nprobe until recall clears the gate" loop,
    run in-engine on a SAMPLED query set so index settings are chosen
    from cluster data without exporting anything.

    ``index`` picks the knob: ``"ivf"`` sweeps nprobe (quantizer fitted
    ONCE and shared across the grid, so settings differ only in probe
    breadth — FAISS practice), ``"lsh"`` sweeps n_planes, ``"sq8"`` and
    ``"pq"`` sweep the re-rank ``refine`` factor (PQ codebooks likewise
    fitted once and shared). Per setting the report row
    carries mean recall@k vs ``brute_force_topk`` (``knn_recall``) and
    the average number of candidates scored per query — the
    recall/cost frontier the operator actually tunes on.

    Scale shape: the exact baseline and each approximate search are the
    module's own bounded plans; everything driver-side is one row per
    grid setting plus per-query recall rows (O(|grid| + |Q|)). The
    exact baseline is checkpointed once and reused by every setting.
    """
    if index == "ivf":
        grid = grid or [1, 2, 4]
    elif index == "lsh":
        grid = grid or [2, 4, 8]
    elif index == "sq8":
        grid = grid or [2, 4, 8]
    elif index == "pq":
        grid = grid or [2, 4, 8]
    else:
        raise ValueError(f"unknown index {index!r} (ivf | lsh | sq8 | pq)")
    if not grid or any(g < 1 for g in grid):
        raise ValueError("grid values must be positive ints")

    q_n = queries.count()
    if q_n == 0:
        raise ValueError("ann_tune: empty query sample")
    exact = brute_force_topk(embeddings, queries, k, id_col, vec_col) \
        .localCheckpoint(eager=True)
    corpus_n = embeddings.count()

    centers_df = None
    ranked_probes = None
    cell_sizes = None
    pq_books = None
    if index == "pq":
        # fit the codebooks ONCE and share them across the grid (the
        # IVF branch's shared-quantizer discipline): refine settings
        # then differ only in re-rank breadth, not in quantization
        pq_books = fit_pq_codebooks(embeddings, vec_col=vec_col,
                                    seed=seed)
    if index == "ivf":
        indexed, centers_df = _fit_ivf_quantizer(
            embeddings, id_col, vec_col, n_centroids, seed)
        # cell sizes once; per-query cell ranking once — every nprobe
        # setting is a prefix of the same ranked probe list
        cell_sizes = (indexed
                      .groupBy("_cell").agg(F.count(F.lit(1)).alias("_sz"))
                      .localCheckpoint(eager=True))
        d2 = F.expr("aggregate(zip_with(_qvec, _center, "
                    "(a, b) -> (a - b) * (a - b)), 0.0D, "
                    "(acc, x) -> acc + x)")
        probe_w = Window.partitionBy("query_id").orderBy(
            F.col("_d2"), F.col("_cell"))
        ranked_probes = (queries.selectExpr(
            f"{quote_col(id_col)} AS query_id",
            f"{as_double_sql(quote_col(vec_col))} AS _qvec")
            .crossJoin(F.broadcast(centers_df))
            .withColumn("_d2", d2)
            .withColumn("_pr", F.row_number().over(probe_w))
            .select("query_id", "_cell", "_pr")
            .localCheckpoint(eager=True))

    report: list[dict] = []
    for g in grid:
        if index == "ivf":
            approx = ivf_topk(embeddings, queries, k,
                              n_centroids=n_centroids, nprobe=g,
                              id_col=id_col, vec_col=vec_col,
                              centroids=centers_df)
            cand_row = (ranked_probes.filter(F.col("_pr") <= g)
                        .join(cell_sizes, on="_cell")
                        .groupBy("query_id").agg(F.sum("_sz").alias("_c"))
                        .agg(F.avg("_c")).first())
            avg_cand = float(cand_row[0] or 0.0)
            setting = {"nprobe": g}
        elif index == "lsh":
            approx = lsh_topk(embeddings, queries, k,
                              id_col=id_col, vec_col=vec_col,
                              n_planes=g, seed=seed)
            cb = random_hyperplane_buckets(
                embeddings.select(F.col(id_col).alias("neighbor_id"),
                                  vec_col),
                vec_col, n_planes=g, seed=seed) \
                .groupBy("bucket").agg(F.count(F.lit(1)).alias("_sz"))
            qb = random_hyperplane_buckets(
                queries.select(F.col(id_col).alias("query_id"), vec_col),
                vec_col, n_planes=g, seed=seed)
            cand_row = (qb.join(cb, on="bucket", how="left")
                        .agg(F.avg(F.coalesce("_sz", F.lit(0)))).first())
            avg_cand = float(cand_row[0] or 0.0)
            setting = {"n_planes": g}
        elif index == "pq":
            approx = pq_topk(embeddings, queries, k, refine=g,
                             codebooks=pq_books,
                             id_col=id_col, vec_col=vec_col, seed=seed)
            # like SQ8, the ADC pass scans the whole CODE corpus per
            # query (codes are ~dim/n_subspaces cheaper per row, not
            # fewer rows); refine*k is the exact re-rank breadth
            avg_cand = float(max(corpus_n - 1, 0))
            setting = {"refine": g}
        else:  # sq8
            approx = sq8_topk(embeddings, queries, k, refine=g,
                              id_col=id_col, vec_col=vec_col)
            # the approximate pass SCANS the whole code corpus per
            # query (that is SQ8's design — codes are ~4x cheaper per
            # row, not fewer rows), so candidates-scored is corpus-wide;
            # refine*k is the exact re-rank breadth, reported separately
            avg_cand = float(max(corpus_n - 1, 0))
            setting = {"refine": g}
        rec = knn_recall(approx, exact).agg(
            F.avg("recall"), F.sum("n_hits"), F.sum("n_exact")).first()
        row = {
            "index": index, "setting": setting, "k": k,
            "n_queries": q_n,
            "recall": round(float(rec[0] or 0.0), 4),
            "n_hits": int(rec[1] or 0), "n_exact": int(rec[2] or 0),
            "avg_candidates": round(avg_cand, 1),
        }
        if index in ("sq8", "pq"):
            row["reranked"] = min(g * k, max(corpus_n - 1, 0))
        report.append(row)
    return report


def hard_negative_topk(
    embeddings: DataFrame, anchors: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label", min_cosine: float | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each labeled
    anchor, the top-k most-similar corpus vectors whose label DIFFERS.

    The near-duplicates of an anchor that carry a different label are
    exactly the "hard negatives" a contrastive or reranker training set
    wants (most informative negatives = highest-similarity mismatches).
    Shape is the brute-force scan: anchors broadcast, ONE pass over the
    corpus, label-mismatch applied as a join predicate so matching-label
    rows are dropped before scoring — at 100 TB this is a narrow
    map-side pass plus a tiny per-anchor top-k shuffle, same plan class
    as ``brute_force_topk``. For larger anchor sets swap the corpus scan
    for ``lsh_topk``/``ivf_topk`` candidates and apply the same label
    filter; semantics here are the exact baseline.

    ``min_cosine`` optionally floors the similarity (negatives easier
    than the floor are useless for training and bloat the output).
    Returns (query_id, query_label, neighbor_id, neighbor_label,
    cosine, rank).
    """
    v = as_double_sql(quote_col(vec_col))
    q = anchors.selectExpr(
        f"{quote_col(id_col)} AS query_id",
        f"{quote_col(label_col)} AS query_label",
        f"{v} AS _qvec",
        f"{l2_norm_sql(v)} AS _qn")
    corpus = embeddings.selectExpr(
        f"{quote_col(id_col)} AS neighbor_id",
        f"{quote_col(label_col)} AS neighbor_label",
        f"{v} AS _cvec",
        f"{l2_norm_sql(v)} AS _cn")
    # exclude ONLY a known-equal label: two NULL-labeled rows are not
    # known to share a class, so a NULL-labeled anchor keeps NULL-labeled
    # neighbors as negatives (eqNullSafe treated NULL==NULL as a match
    # and silently dropped them — review finding)
    label_known_equal = (
        F.col("neighbor_label").isNotNull()
        & F.col("query_label").isNotNull()
        & (F.col("neighbor_label") == F.col("query_label")))
    scored = (corpus.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id")) & ~label_known_equal)
        .select("query_id", "query_label", "neighbor_id", "neighbor_label",
                F.expr(cosine_guarded_sql("_qvec", "_cvec", "(_qn * _cn)"))
                .alias("_cos")))
    if min_cosine is not None:
        scored = scored.filter(F.col("_cos") >= min_cosine)
    # skew-safe per-anchor top-k (full-corpus candidate set — same
    # two-phase treatment as brute_force_topk; identical order + ties)
    return (salted_topk(scored, "query_id", "_cos", k,
                        tiebreak_cols=["neighbor_id"], salt_cols=["neighbor_id"])
            .select("query_id", "query_label", "neighbor_id",
                    "neighbor_label", F.col("_cos").alias("cosine"), "rank"))


def embedding_moments(embeddings: DataFrame, vec_col: str = "embedding"):
    """One pass over the corpus -> (n, mean vector, covariance matrix)
    as driver-side numpy (dim x dim; the corpus itself never shuffles).

    Each Arrow batch contributes one partial (count, sum, X^T X) row —
    numpy BLAS executor-side — and the driver sums the per-batch
    partials: the collected volume is O(batches * dim^2), independent of
    row count, which is what makes the pass viable at 100 TB (dim=64 ->
    4 KB per batch). Covariance is centered driver-side from the raw
    second moment."""
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    schema = StructType([
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ])

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame({
                "n": [len(m)],
                "s": [m.sum(axis=0).tolist()],
                "g": [(m.T @ m).ravel().tolist()],
            })

    rows = (embeddings.filter(F.col(vec_col).isNotNull())
            .select(vec_col).mapInPandas(_partials, schema).collect())
    if not rows:
        raise ValueError("embedding_moments: no non-null vectors")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    dim = len(s)
    g = np.sum([np.array(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def top_principal_component(cov, iters: int = 100, seed: int = 7):
    """Leading eigenvector of a (small, driver-side) covariance matrix
    by fixed-iteration power method — deterministic start vector from
    the seed, sign fixed so the largest-|coord| entry is positive (the
    eigenvector's sign is otherwise arbitrary)."""
    rng = np.random.RandomState(seed)
    v = rng.rand(cov.shape[0])
    v /= np.linalg.norm(v)
    for _ in range(iters):
        v = cov @ v
        nv = np.linalg.norm(v)
        if nv == 0:
            raise ValueError("power iteration collapsed (zero matrix?)")
        v /= nv
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return v


def project_embeddings(
    embeddings: DataFrame, component, mean=None,
    vec_col: str = "embedding", out_col: str = "pc1",
) -> DataFrame:
    """Scalar projection of every vector onto a (literal) component —
    the whole PCA scoring pass compiles to one codegen'd fold per row,
    zero exchanges, exactly like the k-means assignment pass. ``mean``
    (if given) centers each vector first."""
    # listify before lit_array_sql (which consumes generators) so the
    # non-finite fallback below re-reads the same values (ADVICE r14)
    component = list(component)
    if mean is not None:
        mean = list(mean)
    comp = lit_array_sql(component, "double")
    mu = lit_array_sql(mean, "double") if mean is not None else None
    if comp is None or (mean is not None and mu is None):
        # non-finite entries: fall back to the per-element Column form
        c = lit_array(component, "double")
        v = as_double(F.col(vec_col))
        if mean is not None:
            v = F.zip_with(v, lit_array(mean, "double"),
                           lambda x, m: x - m)
        return embeddings.withColumn(out_col, dot(v, c))
    v = as_double_sql(quote_col(vec_col))
    if mu is not None:
        v = f"zip_with({v}, {mu}, (x, m) -> x - m)"
    return embeddings.withColumn(out_col, F.expr(dot_sql(v, comp)))


def top_principal_components(cov, k: int = 2, iters: int = 100,
                             seed: int = 7):
    """Leading k eigenvectors (and eigenvalues) by power iteration with
    Hotelling deflation: after extracting v_i with eigenvalue l_i,
    iterate on cov - l_i v_i v_i^T. Driver-side on the tiny dim x dim
    matrix; same sign convention as ``top_principal_component``."""
    if k < 1 or k > cov.shape[0]:
        raise ValueError("k must be in [1, dim]")
    m = np.array(cov, dtype=np.float64, copy=True)
    comps, evals = [], []
    for _ in range(k):
        v = top_principal_component(m, iters=iters, seed=seed)
        lam = float(v @ m @ v)
        comps.append(v)
        evals.append(lam)
        m = m - lam * np.outer(v, v)
    return np.array(comps), np.array(evals)


def project_embeddings_multi(
    embeddings: DataFrame, components, mean=None,
    vec_col: str = "embedding", out_prefix: str = "pc",
) -> DataFrame:
    """Project every vector onto k (literal) components in ONE
    projection pass -> columns pc1..pck. Still zero exchanges: the k
    dot products share the single centered-vector subexpression."""
    # listify before lit_array_sql (which consumes generators) so the
    # non-finite fallback below re-reads the same values (ADVICE r14)
    components = [list(c) for c in components]
    if mean is not None:
        mean = list(mean)
    comp_sqls = [lit_array_sql(c, "double") for c in components]
    mu = lit_array_sql(mean, "double") if mean is not None else None
    if any(c is None for c in comp_sqls) or (mean is not None
                                             and mu is None):
        # non-finite entries: fall back to the per-element Column form
        v = as_double(F.col(vec_col))
        if mean is not None:
            v = F.zip_with(v, lit_array(mean, "double"),
                           lambda x, m: x - m)
        cols = [dot(v, lit_array(c, "double")).alias(f"{out_prefix}{i + 1}")
                for i, c in enumerate(components)]
        return embeddings.select("*", *cols)
    v = as_double_sql(quote_col(vec_col))
    if mu is not None:
        v = f"zip_with({v}, {mu}, (x, m) -> x - m)"
    cols = [F.expr(f"{dot_sql(v, c)} AS "
                   f"{quote_col(f'{out_prefix}{i + 1}')}")
            for i, c in enumerate(comp_sqls)]
    return embeddings.select("*", *cols)
