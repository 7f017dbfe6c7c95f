"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; LSH bucketing is the scale
path (probe only same-bucket candidates — at 100 TB the cross join is the
bottleneck, so the bucketed variant turns O(N*Q) into O(N*Q/buckets) with
recall traded via band count).

All dot products / norms are computed JVM-side with ``zip_with`` +
``aggregate`` (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    (huge) corpus — one scan of the corpus, no shuffle until the final
    per-query top-k (tiny). Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        as_double(F.col(vec_col)).alias("_qvec"),
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cvec"))
    scored = (
        corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col, "neighbor_id",
            cosine(F.col("_qvec"), F.col("_cvec")).alias("_cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
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
    products, nothing else."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = first["d"] if first else 0
    v = as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = F.array(*[F.lit(c) for c in _plane(seed, p, dim)])
        sign_bit = (dot(v, comps) >= 0).cast("long")
        bucket = bucket * 2 + sign_bit
    return df.withColumn("bucket", bucket)


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
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        cos = (m / norms) @ (m / norms).T
        iu = np.triu_indices(len(m), k=1)
        vals = cos[iu]
        # no rounding here: double rounding (python banker's then SQL
        # HALF_UP) flips values sitting on a rounding boundary
        return pd.DataFrame({
            "label": [pdf[label_col].iloc[0]],
            "n_pairs": [len(vals)],
            "max_cosine": [float(vals.max())],
            "avg_cosine": [float(vals.mean())],
        })

    return embeddings.select(label_col, id_col, vec_col).groupBy(
        label_col).applyInPandas(
            _stats,
            "label int, n_pairs long, max_cosine double, avg_cosine double")


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
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("_cvec"))
    d2_to = {}
    for src in ("_cvec", "_qvec"):
        d2_to[src] = F.aggregate(
            F.zip_with(F.col(src), F.col("_center"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        with_vec = corpus.withColumn("_features", array_to_vector("_cvec"))
        km = (KMeans(k=n_centroids, seed=seed, maxIter=max_iter,
                     featuresCol="_features", predictionCol="_cell")
              .fit(with_vec))
        indexed = km.transform(with_vec).select("neighbor_id", "_cvec", "_cell")
        centers = [(i, [float(x) for x in c])
                   for i, c in enumerate(km.clusterCenters())]
        centers_df = embeddings.sparkSession.createDataFrame(
            centers, "_cell int, _center array<double>")
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
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qvec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_d2"), F.col("_cell"))
    probes = (q.crossJoin(F.broadcast(centers_df))
              .withColumn("_d2", d2_to["_qvec"])
              .withColumn("_pr", F.row_number().over(probe_w))
              .filter(F.col("_pr") <= nprobe)
              .select("query_id", "_qvec", "_cell"))

    scored = (indexed.join(F.broadcast(probes), on="_cell")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("_qvec"), F.col("_cvec")).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


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
        parts = []
        for p in range(n_probes):
            b = random_hyperplane_buckets(
                df, vec_col, n_planes, seed + 7919 * p, dim)
            parts.append(b.select(
                F.col(id_col).alias(alias_id),
                as_double(F.col(vec_col)).alias(f"_{alias_id}_v"),
                F.lit(p).alias("probe"), "bucket"))
        out = parts[0]
        for more in parts[1:]:
            out = out.unionByName(more)
        return out

    corpus = _bucketed(embeddings, "neighbor_id")
    q = _bucketed(queries, "query_id")
    scored = (
        corpus.join(F.broadcast(q), on=["probe", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("_query_id_v"), F.col("_neighbor_id_v"))
                .alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
